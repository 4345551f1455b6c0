#!/usr/bin/env python3
"""Generate golden mapreduce outputs by executing the REFERENCE's own
functions (extracted verbatim from /root/reference/debgpt) over fixed
fixtures, for byte-for-byte comparison with the Scala engine.

Extraction: function sources are cut from the reference files by
regex and exec'd with UI stubs (console/track); the control flow of
mapreduce_super_long_context (mapreduce.py:434-550) is followed for
each mode combination. No reference code is copied into the repo —
this generates test data only.
"""
import collections
import json
import re
import sys

REF = "/root/reference/debgpt"


def extract(path, names):
    src = open(path).read()
    out = []
    for name in names:
        m = re.search(rf"^def {name}\(.*?(?=^def |\Z)", src, re.S | re.M)
        assert m, name
        out.append(m.group(0))
    return "\n".join(out)


def extract_nested(path, names, indent=4):
    """Extract nested defs (create_*_wrapper inside read())."""
    src = open(path).read()
    out = []
    for name in names:
        m = re.search(
            rf"^ {{{indent}}}def {name}\(.*?(?=^ {{{indent}}}def |^ {{{indent}}}\S)",
            src, re.S | re.M)
        assert m, name
        out.append("\n".join(l[indent:] if len(l) >= indent else l
                             for l in m.group(0).split("\n")))
    return "\n".join(out)


class _Console:
    def print(self, *a, **k):
        pass

    def log(self, *a, **k):
        pass


def track(it, **k):
    return it


def main():
    ns = {
        "List": list, "Dict": dict, "Tuple": tuple, "Optional": object,
        "console": _Console(), "track": track,
        "it": __import__("itertools"), "ft": __import__("functools"),
    }
    ns["Entry"] = collections.namedtuple(
        "Entry", ["path", "content", "wrapfun", "wrapfun_chunk"])
    exec("import functools as ft\nimport itertools as it", ns)
    exec(extract(f"{REF}/reader.py", ["chunk_lines", "chunk_entry"]), ns)
    exec(extract_nested(f"{REF}/reader.py",
                        ["create_wrapper", "create_chunk_wrapper"]), ns)
    exec(re.sub(r"chunk: Entry", "chunk",
         re.sub(r"chunks: List\[Entry\]", "chunks",
         re.sub(r"frtnd: frontend\.AbstractFrontend", "frtnd",
         re.sub(r"results: List\[str\]", "results",
         extract(f"{REF}/mapreduce.py", [
             "shorten", "pad_chunk_before_map", "group_chunks_by_length",
             "pad_chunks_before_map", "map_chunk", "map_chunks",
             "map_serial", "map_serial_compact", "pad_two_results_for_reduce",
             "reduce_two_chunks", "pad_many_results_for_reduce",
             "reduce_many_chunks", "group_strings_by_length",
             "reduce_serial", "reduce_serial_compact"]))))), ns)
    exec("import textwrap", ns)

    class Lossy:
        def oneshot(self, s):
            return s[::2]

    # fixture: 6 multi-line docs, the same ones the Scala test builds
    docs = []
    for i in range(6):
        body = "\n".join(
            f"doc {i} line {j} " + "tok " * (3 + (i + j) % 4)
            for j in range(5))
        docs.append((f"doc{i}.txt", body))

    chunk_size = 96
    question = "what is in these files?"
    chunks = []
    for spec, content in docs:
        wrapfun = ns["create_wrapper"]("Here is the contents of file `{}`:", spec)
        wrapfun_chunk = ns["create_chunk_wrapper"](
            "Here is the contents of file {} (lines {}-{}):", spec)
        entry = ns["Entry"](spec, content, wrapfun, wrapfun_chunk)
        chunks.extend(ns["chunk_entry"](entry, chunk_size))

    frtnd = Lossy()
    goldens = {"n_chunks": len(chunks)}
    for cmap in (False, True):
        for cred in (False, True):
            # mapreduce.py:494-547, serial branches
            if cmap:
                inter = ns["map_serial_compact"](chunks, question, frtnd,
                                                 max_chunk_size=chunk_size)
            else:
                inter = ns["map_serial"](chunks, question, frtnd)
            if cred:
                agg = ns["reduce_serial_compact"](inter, question, frtnd,
                                                  max_chunk_size=chunk_size)
            else:
                agg = ns["reduce_serial"](inter, question, frtnd)
            goldens[f"map{'C' if cmap else 'B'}_red{'C' if cred else 'B'}"] = \
                agg + "\n\n"  # mapreduce.py:549-550

    # 1-chunk short-circuit (mapreduce.py:489-490)
    spec, content = "single.txt", "only\nfour\nshort\nlines"
    wf = ns["create_chunk_wrapper"](
        "Here is the contents of file {} (lines {}-{}):", spec)
    e = ns["Entry"](spec, content, None, wf)
    single = ns["chunk_entry"](e, 10_000)
    assert len(single) == 1
    goldens["single_chunk"] = single[0].wrapfun_chunk(single[0].content)

    with open(sys.argv[1], "w") as f:
        json.dump(goldens, f, indent=1)
    print(f"wrote {sys.argv[1]}: n_chunks={goldens['n_chunks']}, "
          f"keys={sorted(goldens)}")


if __name__ == "__main__":
    main()
