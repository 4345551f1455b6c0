#!/usr/bin/env python3
"""HTML→text goldens for graft.ingest.HtmlText.

The reference's URL pipeline is `BeautifulSoup(content,
features='html.parser').get_text()` + strip/squeeze/rstrip
(reader.py:461-466). bs4's html.parser builder wraps the STDLIB
tokenizer, so the golden runs `html.parser.HTMLParser`
(convert_charrefs=True — bs4's default) and applies bs4 ≥4.9's
get_text typing rules: script/style/template strings and
comments/declarations/PIs are not text. Fixture docs cover the
tokenizer's corners; HtmlTextSpec asserts byte parity.
"""
import json
import re
import sys
from html.parser import HTMLParser


class TextExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts = []
        self.container_stack = []  # bs4 string_container_stack

    CONTAINERS = {"script", "style", "template"}

    def handle_starttag(self, tag, attrs):
        if tag in self.CONTAINERS:
            self.container_stack.append(tag)

    def handle_endtag(self, tag):
        if tag in self.CONTAINERS and self.container_stack \
                and self.container_stack[-1] == tag:
            self.container_stack.pop()

    def handle_data(self, data):
        # bs4: the nearest open *container* types the string; Script/
        # Stylesheet/TemplateString are excluded from get_text
        if not self.container_stack:
            self.parts.append(data)

    def text(self):
        return "".join(self.parts)


def html_to_text(content: str) -> str:
    p = TextExtractor()
    p.feed(content)
    p.close()
    text = p.text().strip()
    text = re.sub("\n\n+\n", "\n\n", text)
    return "\n".join(x.rstrip() for x in text.split("\n"))


FIXTURES = {
    "basic": "<html><body><p>Hello <b>world</b></p></body></html>",
    "entities": "A &amp; B &lt;tag&gt; &quot;q&quot; &#65;&#x42; &nbsp;end "
                "&copy &copyx &notareal; &times&timesb; &#0; &#x110000; "
                "&#xD800; &#11; mid&ampstop",
    "script_style": "<p>before</p><script>var x = '<b>not text</b>';\n"
                    "if (a < b) {}</script><style>p { color: red }\n"
                    "/* <i>nope</i> */</style><p>after</p>",
    "script_case": "<SCRIPT TYPE='text/javascript'>hidden</SCRIPT>text"
                   "<Script>also</ScRiPt >tail",
    "script_selfclose": "<script/>visible<p>x</p>",
    "template": "<div>a<template><div>ghost <b>nested</b></div>"
                "</template>b</div>",
    "template_nested_script": "<template><script>s</script>t</template>out",
    "comments": "x<!-- a comment <p>no</p> -->y<!---->z<!- bogus>w",
    "doctype_pi": "<!DOCTYPE html><?php echo 'no'; ?><p>yes</p>"
                  "<![CDATA[gone]]>tail",
    "quoted_gt": "<a title=\"x > y\" href='q>r'>link</a> after",
    "literal_lt": "a < b and c<3 but <em>real</em> < the end",
    "whitespace": "<html>\n <body>\n\n\n<p>line1</p>\n\n\n\n"
                  "<p>line2  </p> \n   \n \n<p>t</p>\n</body>\n</html>\n",
    "nbsp_edges": "&nbsp; <p>mid&nbsp;dle</p> &nbsp;",
    "attrs_noquote": "<img src=x.png alt=hi>txt<input value=a/>u",
    "numeric_refs": "&#8364;|&#x20AC;|&#128;|&#x1F600;|&#120171;|&#xFDD0;|"
                    "&#55296;|&#1114112;|&#13;",
    "no_semicolon": "&ampx &amp &lta&gtb &notin &noti &timesbar;x",
    "unterminated_comment": "keep<!-- never closed",
    "unterminated_tag": "keep<a href='x",
    "unterminated_script": "keep<script>lost forever",
    "end_tag_spaces": "a<p>b</p >c</ p>d",
    "nested_tags": "<div><ul><li>one</li><li>two</li></ul></div>",
    "mixed_real": """<!DOCTYPE html>
<html lang="en">
<head><meta charset="utf-8"><title>Debian -- News</title>
<style>body{margin:0}</style></head>
<body>
<div id="header"><a href="/">Debian</a> &middot; <a href="/news">News</a></div>
<h1>News &amp; Updates</h1>
<p>The latest release &mdash; codename &ldquo;trixie&rdquo; &mdash; is
out.  See the <a href="/releases">release notes</a>&nbsp;&raquo;</p>
<script type="text/javascript">trackPageview();</script>
<!-- footer begins -->
<div class="footer">&copy; 2026 SPI Inc.</div>
</body></html>""",
}


def fuzz_docs(n=60, seed=2026):
    """Randomized documents over the tokenizer's alphabet of corners:
    tags (incl. script/style/template, self-closing, attributes with
    quoted '>'), entities (named/legacy/numeric/bogus), comments,
    doctypes, PIs, literal '<'s, newline runs, unicode.
    """
    import random
    rng = random.Random(seed)
    tags = ["p", "div", "span", "b", "a", "li", "td"]
    special_open = ["<script>", "<style>", "<template>",
                    "<script type='t>e'>", "<SCRIPT>"]
    special_close = {"<script>": "</script>", "<style>": "</style>",
                     "<template>": "</template>",
                     "<script type='t>e'>": "</script >",
                     "<SCRIPT>": "</ScRiPt>"}
    entities = ["&amp;", "&lt;", "&nbsp;", "&copy", "&ampx", "&notareal;",
                "&#65;", "&#x42;", "&#0;", "&#xD800;", "&#1114112;",
                "&bogus;", "&", "&&amp;", "&#", "&mdash;", "&timesb;"]
    words = ["alpha", "beta", "中文", "γδ", "x<y", "a]b", "7", ""]
    docs = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(3, 25)):
            r = rng.random()
            if r < 0.35:
                parts.append(rng.choice(words) + rng.choice([" ", "\n", "\n\n",
                                                             "\n\n\n", "  \n"]))
            elif r < 0.5:
                parts.append(rng.choice(entities))
            elif r < 0.65:
                t = rng.choice(tags)
                attr = rng.choice(["", " class='c'", ' href="u>v"', " x=1"])
                parts.append(f"<{t}{attr}>" + rng.choice(words) + f"</{t}>")
            elif r < 0.75:
                o = rng.choice(special_open)
                parts.append(o + rng.choice(["code < 1", "a&amp;b", "\n\n"])
                             + special_close[o])
            elif r < 0.85:
                parts.append(rng.choice(["<!-- c -->", "<!DOCTYPE html>",
                                         "<?pi ?>", "<![CDATA[zz]]>",
                                         "<!- bogus>", "</ odd>"]))
            else:
                parts.append(rng.choice(["< loose", "a<1", "tag</",
                                         "fin<", "self<br/>ok"]))
        docs.append("".join(parts))
    return {f"fuzz_{i:02d}": d for i, d in enumerate(docs)}


def main() -> None:
    all_fixtures = dict(FIXTURES)
    all_fixtures.update(fuzz_docs())
    goldens = {name: {"html": html, "text": html_to_text(html)}
               for name, html in all_fixtures.items()}
    with open(sys.argv[1], "w") as f:
        json.dump(goldens, f, indent=1, ensure_ascii=False)
    print(f"wrote {sys.argv[1]}: {len(goldens)} cases")


if __name__ == "__main__":
    main()
