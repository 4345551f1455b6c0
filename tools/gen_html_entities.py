#!/usr/bin/env python3
"""Emit the HTML5 named-character-reference table from Python's stdlib
(html.entities.html5 — the table html.unescape and html.parser's
convert_charrefs use) as a TSV resource for graft.ingest.HtmlText.

Format: one `name<TAB>cp[,cp]` per line (codepoints in hex, since
values include control characters like &NewLine;). Names include the
trailing ';' where the spec defines one; the no-semicolon legacy forms
are separate entries, exactly as in the stdlib dict.
"""
import html.entities
import pathlib

OUT = (pathlib.Path(__file__).resolve().parent.parent /
       "src/main/resources/graft/html5_entities.tsv")


def main() -> None:
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        for name, value in sorted(html.entities.html5.items()):
            assert "\t" not in name
            cps = ",".join(f"{ord(c):x}" for c in value)
            f.write(f"{name}\t{cps}\n")
    print(f"wrote {OUT}: {len(html.entities.html5)} entities")


if __name__ == "__main__":
    main()
