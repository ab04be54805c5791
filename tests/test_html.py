"""Mini HTML DOM + CSS selector engine tests, plus the analyze semantics
(rule sets over a parsed page, Analyzer::analyze directives.rs:581-615)."""

from lopez_ray.dsl import parser as P
from lopez_ray.dsl.exprs import AggregatorExpressionState
from lopez_ray.html.cssselect import compile_selector
from lopez_ray.html.dom import parse_html

DOC = """
<html><head><title>My Page</title>
<link rel="canonical" href="https://x.test/canon">
<meta name="description" content="desc here">
</head>
<body class="main dark">
<h1 id="top">Hello <b>World</b></h1>
<h2>A</h2><h2>B</h2>
<div><p class="x">one</p><p>two</p><span>three</span></div>
<table><tr><td><a href="https://a.test/1">A1</a></td>
<td><a href="http://b.test/2">B2</a></td></tr></table>
<img src="/i1.png"><img src="/i2.png" alt="ok">
<ul><li>e1</li><li>e2</li></ul>
</body></html>
"""


def sel(css, doc=None):
    d = doc or parse_html(DOC)
    return list(d.select(compile_selector(css)))


def test_basic_selectors():
    assert [e.name for e in sel("h2")] == ["h2", "h2"]
    assert len(sel("*")) == 25
    assert [e.attrs["href"] for e in sel('link[rel="canonical"]')] == ["https://x.test/canon"]
    assert len(sel('meta[name="description"]')) == 1
    assert [e.attrs["src"] for e in sel("img:not([alt])")] == ["/i1.png"]
    assert [e.text_nodes() for e in sel("#top")] == [["Hello ", "World"]]
    assert len(sel(".x")) == 1
    assert len(sel("body.main")) == 1
    assert len(sel("body.missing")) == 0


def test_combinators():
    assert [e.attrs["href"] for e in sel('td > a[href^="https"]')] == ["https://a.test/1"]
    assert [e.name for e in sel("div p")] == ["p", "p"]
    assert [e.text_nodes()[0] for e in sel("p + p")] == ["two"]
    assert [e.text_nodes()[0] for e in sel("p ~ span")] == ["three"]
    assert [e.name for e in sel("head title")] == ["title"]
    assert sel("div > span")[0].text_nodes() == ["three"]


def test_selector_groups_and_ci():
    assert len(sel("h1, h2")) == 3
    assert len(sel('a[href^="HTTPS" i]')) == 1


def test_element_api():
    d = parse_html(DOC)
    h1 = next(d.select(compile_selector("h1")))
    assert h1.attrs.get("id") == "top"
    assert h1.parent_element().name == "body"
    assert [c.name for c in h1.child_elements()] == ["b"]
    b = h1.child_elements()[0]
    assert b.outer_html() == "<b>World</b>"
    assert h1.inner_html() == "Hello <b>World</b>"
    body = next(d.select(compile_selector("body")))
    assert body.classes() == ["main", "dark"]


def analyze(rule_src, html_src):
    rs = P.parse_items(rule_src)[0]
    doc = parse_html(html_src)
    states = [(n, AggregatorExpressionState(a)) for n, a in rs.aggregators]
    for el in doc.select(rs.selector):
        for _, st in states:
            st.aggregate(el)
    return {n: st.finalize() for n, st in states}


def test_analyze_seo_like_rules():
    out = analyze(
        "select head title { title: first(text); count-title: count; }", DOC
    )
    assert out == {"title": "My Page", "count-title": 1}

    out = analyze("select h2 { h2s: collect(text); }", DOC)
    assert out == {"h2s": ["A", "B"]}

    out = analyze('select img:not([alt]) { missing: collect(attr "src"); }', DOC)
    assert out == {"missing": ["/i1.png"]}

    out = analyze("select p { byclass: group(name, count); }", DOC)
    assert out == {"byclass": {"p": 2}}

    out = analyze("select ul { items: collect(select-all(text, li) !explode); }", DOC)
    assert out == {"items": ["e1", "e2"]}

    out = analyze("select div { first-p: first(select-any(text pretty, p)); }", DOC)
    assert out == {"first-p": "one\n"}

    out = analyze("select b { up: first(parent(name)); }", DOC)
    assert out == {"up": "h1"}

    out = analyze("select h1 { kids: collect(children(name) !explode); }", DOC)
    assert out == {"kids": ["b"]}

    out = analyze(
        'select a { nums: collect(attr "href" capture "[0-9]+" get "0" as-number); }',
        DOC,
    )
    assert out == {"nums": [1.0, 2.0]}

    out = analyze("select p { distinct-names: distinct(name); }", DOC)
    assert out == {"distinct-names": ["p"]}

    out = analyze("select td { n-true: count(select-any(text, a) is-not-null); }", DOC)
    assert out == {"n-true": 2}


def test_analyze_in_page_gate():
    rs = P.parse_items('select in "^https://yes/" h1 { t: count; }')[0]
    assert rs.in_page.search("https://yes/page") is not None
    assert rs.in_page.search("https://no/page") is None
