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


def main() -> None:
    goldens = {name: {"html": html, "text": html_to_text(html)}
               for name, html in FIXTURES.items()}
    with open(sys.argv[1], "w") as f:
        json.dump(goldens, f, indent=1, ensure_ascii=False)
    print(f"wrote {sys.argv[1]}: {len(goldens)} cases")


if __name__ == "__main__":
    main()
