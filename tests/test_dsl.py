"""DSL parser + expression engine tests, porting the reference's inline
unit tests (directives/parse.rs, expressions/parse.rs, transformer.rs)."""

import math

import pytest

from lopez_ray.dsl import parser as P
from lopez_ray.dsl.exprs import (
    Transformer,
    TransformerExpression,
    cmp_json_key,
    pretty,
    rust_f64_display,
    rust_parse_f64,
)
from lopez_ray.dsl.types import ANY, BOOL, NUMBER, STRING, ArrayT, MapT
from lopez_ray.hash import rust_str_hash


def parse_one(src):
    items = P.parse_items(src)
    assert len(items) == 1
    return items[0]


# ---- parse.rs ports ----


def test_identifier():
    c = P._Cursor("a-very_funnyIdentifier_SCREAMING_$123")
    assert c.identifier() == "a-very_funnyIdentifier_SCREAMING_$123"


def test_escaped_string():
    c = P._Cursor('"foo\\"\nbar"ho-ho')
    assert c.escaped_string() == 'foo"\nbar'
    c = P._Cursor('"foo\\.bar"')
    assert c.escaped_string() == "foo\\.bar"  # backslash kept for non-quote


def test_rule_set_forms():
    rs = parse_one('select td > a[href^="https"] { foo: first ( text ) ; }')
    assert rs.aggregators[0][0] == "foo"
    parse_one("select ul { list: group(text, first(text pretty)); }")
    parse_one("select ul { list: collect(select-all(text, li) pretty); }")
    rs = parse_one('select in "^https://x/" h1 { t: first(text); }')
    assert rs.in_page.pattern == "^https://x/"
    rs = parse_one("select input { n: count; }")  # `in` backtracking
    assert rs.in_page is None


def test_items():
    items = P.parse_items(
        """
        // a comment
        import "seo";
        seed "https://example.foo/bar/baz";
        allow "^https?://example.foo/";
        disallow "bad";
        frontier "^https://f/";
        use param "page";
        ignore param "utm_source";
        use param *;
        set quota = 500;
        set max_hits_per_sec = 100.0;
        set user_agent = "tester/1.0";
        use webdriver on "^https://js/";
        select * { } set foo = "bar";
        """
    )
    kinds = [type(i).__name__ for i in items]
    assert kinds == [
        "Import", "Seed", "BoundaryItem", "BoundaryItem", "BoundaryItem",
        "BoundaryItem", "BoundaryItem", "BoundaryItem", "SetVariable",
        "SetVariable", "SetVariable", "WebDriverItem", "RuleSet", "SetVariable",
    ]
    assert items[8].value == 500 and isinstance(items[8].value, int)
    assert items[9].value == 100.0 and isinstance(items[9].value, float)


def test_literals():
    assert P._parse_literal(P._Cursor('"a string"')) == "a string"
    assert P._parse_literal(P._Cursor("1.234")) == 1.234
    v = P._parse_literal(P._Cursor("1234"))
    assert v == 1234 and isinstance(v, int)
    assert P._parse_literal(P._Cursor("-1234")) == -1234
    assert P._parse_literal(P._Cursor("-1234.0")) == -1234.0
    assert P._parse_literal(P._Cursor('[1, 2, "a"]')) == [1, 2, "a"]


def test_duplicate_rule_rejected():
    with pytest.raises(P.ParseError):
        P.parse_items("select a { x: count; x: count; }")


def test_transformer_chain_parse():
    rs = parse_one(
        'select a { v: first(attr "src" all-captures "[0-9]+" !explode) length; }'
    )
    name, agg = rs.aggregators[0]
    assert agg.aggregator.kind == "first"
    assert agg.aggregator.expr.explodes
    assert agg.transformers.transformers[0].kind == "length"
    inner = agg.aggregator.expr.expr
    assert inner.extractor.kind == "attr" and inner.extractor.args == ("src",)
    assert inner.transformers.transformers[0].kind == "all-captures"


def test_type_checking():
    rs = parse_one("select a { n: count; }")
    assert rs.aggregators[0][1].type_of() == NUMBER
    rs = parse_one("select a { n: collect(text hash); }")
    assert rs.aggregators[0][1].type_of() == ArrayT(NUMBER)
    rs = parse_one('select a { n: group(name, count); }')
    assert rs.aggregators[0][1].type_of() == MapT(NUMBER)
    rs = parse_one("select a { n: sum(text as-number) as-string; }")
    assert rs.aggregators[0][1].type_of() == STRING
    with pytest.raises(Exception):
        parse_one("select a { n: sum(text); }")[0][1].type_of()


# ---- transformer.rs semantics ports ----


def test_pretty_reference_vectors():
    assert pretty("\n\n\n\n\t    \r\r\n\n ") == ""
    assert pretty("\n\na\n\n\t    \r\rb\n\n ") == "a\nb\n"
    assert pretty("\n\n\na\n\t    \r\r\n\n ") == "a\n"
    assert pretty("\n\n\na\n\t    \r\r\n\n c") == "a\nc\n"


def eval_chain(src, value):
    te = P._parse_transformer_expression(P._Cursor(src))
    return te.eval(value)


def test_null_propagation():
    assert eval_chain("length", None) is None
    assert eval_chain("is-null", None) is True
    assert eval_chain("is-not-null", None) is False
    assert eval_chain('capture "x" get "0" length greater-than 3', None) is None


def test_numeric_transformers():
    assert eval_chain("as-number", "3.25") == 3.25
    assert eval_chain("as-number", "zzz") is None
    assert eval_chain("as-number", " 1") is None  # Rust parse: no trim
    assert eval_chain("greater-than 2", 3) is True
    assert eval_chain("lesser-or-equal 2", 2) is True
    # REFERENCE BUG replicated: greater-or-equal evals as strict >
    assert eval_chain("greater-or-equal 2", 2) is False
    assert eval_chain("between 1 and 3", 2.0) is True
    assert eval_chain("equals 2", 2.0) is True
    assert eval_chain("in [1, 2, 3]", 2) is True
    assert eval_chain("in [1, 3]", 2) is False


def test_string_transformers():
    assert eval_chain("length", "héllo") == 6  # bytes, not chars
    assert eval_chain("is-empty", "") is True
    assert eval_chain('equals "a"', "a") is True
    assert eval_chain('in ["a", "b"]', "b") is True
    assert eval_chain('matches "^h"', "hello") is True
    assert eval_chain('replace "l+" with "L"', "hello") == "heLo"
    assert eval_chain("hash", "x") == rust_str_hash("x")
    assert eval_chain("as-string", 1.0) == "1"
    assert eval_chain("as-string", 2.5) == "2.5"
    assert eval_chain("as-string", True) == "true"


def test_capture():
    out = eval_chain('capture "(?P<num>[0-9]+)-([a-z]+)"', "id: 42-abc!")
    assert out == {"0": "42-abc", "num": "42", "2": "abc"}
    out = eval_chain('all-captures "[0-9]+"', "1 22 333")
    assert out == [{"0": "1"}, {"0": "22"}, {"0": "333"}]
    assert eval_chain('capture "zzz"', "abc") is None


def test_collection_transformers():
    assert eval_chain("flatten", [[1], None, [2, 3]]) == [1, 2, 3]
    assert eval_chain("get 1", [10, 20]) == 20
    assert eval_chain("get 5", [10, 20]) is None
    assert eval_chain('get "k"', {"k": 7}) == 7
    assert eval_chain('get "z"', {"k": 7}) is None
    assert eval_chain("each(length)", ["ab", "c"]) == [2, 1]
    assert eval_chain('filter(greater-than 1)', [0, 1, 2, 3]) == [2, 3]
    assert eval_chain("any(greater-than 2)", [1, 3]) is True
    assert eval_chain("all(greater-than 2)", [1, 3]) is False
    assert eval_chain("sort", [3, 1, None, 2]) == [None, 1, 2, 3]
    assert eval_chain("sort-by(length)", ["ccc", "a", "bb"]) == ["a", "bb", "ccc"]
    assert eval_chain("length", [1, 2]) == 2
    assert eval_chain("length", {"a": 1}) == 1


def test_replace_dollar_groups():
    assert eval_chain('replace "(?P<a>h)" with "[$a]"', "hi") == "[h]i"


def test_rust_f64_display():
    assert rust_f64_display(1.0) == "1"
    assert rust_f64_display(-2.0) == "-2"
    assert rust_f64_display(0.1) == "0.1"
    assert rust_f64_display(1e20) == "100000000000000000000"


def test_cmp_json_ordering():
    vals = ["b", None, "a"]
    assert sorted(vals, key=cmp_json_key) == [None, "a", "b"]
    assert sorted([[2], [1, 5], [1]], key=cmp_json_key) == [[1], [1, 5], [2]]
