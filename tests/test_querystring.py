"""Query-string mini-language (engine/querystring.py): parser unit +
property tests, and end-to-end dispatch equivalence against the
structured API (the frozen translation contract)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine import query as Q
from engine.analyzer import DEFAULT_ANALYZER
from engine.build import build_index
from engine.config import IndexConfig
from engine.querystring import (QueryStringError, parse_query_string,
                                search_query_string)


@pytest.fixture(scope="module")
def qs_index(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("qs") / "idx")
    return build_index(spark, corpus_df, d,
                       IndexConfig(index_positions=True, fuzzy_edits=2,
                                   doc_values=("role", "ts")))


def P(s):
    return parse_query_string(s, DEFAULT_ANALYZER)


def test_parser_units():
    s = P('b -c f^2 g~1 h* i~2')
    assert s["must"] == []
    assert s["should"] == {"b": 1.0, "f": 2.0}
    assert s["exclude"] == ["c"]
    assert s["prefix"] == ["h"]
    assert s["fuzzy"] == [("g", 1), ("i", 2)]
    assert s["phrase"] is None
    s = P('+a b -c f^2')
    assert s["must"] == ["a"] and s["should"] == {"b": 1.0, "f": 2.0}
    s = P('"d e"~2 -x')
    assert s["phrase"] == ("d e", 2) and s["exclude"] == ["x"]
    assert P('"d e"')["phrase"] == ("d e", 0)
    assert P("g~")["fuzzy"] == [("g", 1)]  # frozen ~ default: 1 edit
    # a clause analyzing to several tokens fans out its polarity/weight
    s = P("+don't x-y^3")
    assert s["must"] == ["don", "t"]
    assert s["should"] == {"x": 3.0, "y": 3.0}


@pytest.mark.parametrize("bad,msg", [
    ('"a b" c', "composes with - excludes only"),
    ('"a" "b"', "at most one phrase"),
    ('"  "', "empty phrase"),
    ('"unbalanced', "unbalanced quote"),
    ("+a h*", "do not compose with"),
    ("+h^2", "no \\^weight"),
    ("+h*", "do not apply to expansions"),
    ("a^0", "weight must be > 0"),
    ("g~3", "~1 or ~2 only"),
    ("x y*z*", "one token"),
    ("+", "dangling"),
    ("", "empty query string"),
    ("!!!", "no analyzer tokens"),
])
def test_parser_errors(bad, msg):
    with pytest.raises(QueryStringError, match=msg):
        P(bad)


_tok = st.text(alphabet="abcdefgh", min_size=1, max_size=4)


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["must", "should", "boost", "not"]), _tok),
    min_size=1, max_size=8))
def test_parser_roundtrip_property(clauses):
    """Render a random structured spec to the mini-language and parse it
    back: the parser must recover exactly the structured form. An
    all-negative spec is invalid (no positive clause), so ensure one."""
    if all(kind == "not" for kind, _ in clauses):
        clauses = clauses + [("should", "zz")]
    parts, want_must, want_should, want_not = [], [], {}, []
    for kind, t in clauses:
        if kind == "must":
            parts.append("+" + t)
            want_must.append(t)
        elif kind == "not":
            parts.append("-" + t)
            want_not.append(t)
        elif kind == "boost":
            parts.append(t + "^2.5")
            want_should[t] = 2.5
        else:
            parts.append(t)
            want_should.setdefault(t, 1.0)
            if want_should[t] != 1.0:
                want_should[t] = 1.0  # later plain clause overwrites
    s = P(" ".join(parts))
    assert s["must"] == want_must
    assert s["should"] == want_should
    assert s["exclude"] == want_not


def _pairs(df):
    return [(r.doc_id, r.score) for r in df.collect()]


def test_dispatch_matches_structured(qs_index):
    idx = qs_index
    # plain + boost + exclude -> search(term_boosts=)
    assert _pairs(search_query_string(idx, "hot0 w010^2.5 -mid1")) == \
        _pairs(Q.search(idx, "hot0 w010", k=10, exclude="mid1",
                        term_boosts={"w010": 2.5}))
    # musts -> one BOOL batch entry == search_bool
    assert _pairs(search_query_string(idx, "+hot0 w010 w020")) == \
        _pairs(Q.search_bool(idx, "hot0", "w010 w020", k=10))
    # phrase (+ exclude, slop) — the phrase job's (doc_id, n_phrase)
    pg = [(r.doc_id, r.n_phrase) for r in
          search_query_string(idx, '"hot0 hot1"~3 -w010').collect()]
    pw = [(r.doc_id, r.n_phrase) for r in
          Q.search_phrase(idx, "hot0 hot1", k=10, slop=3,
                          exclude="w010").collect()]
    assert pg == pw
    # prefix expansion == search_prefix (same frozen cap)
    assert _pairs(search_query_string(idx, "w1*", max_expansions=64)) == \
        _pairs(Q.search_prefix(idx, "w1", k=10, max_expansions=64))
    # fuzzy expansion == search_fuzzy
    assert _pairs(search_query_string(idx, "rar3~1")) == \
        _pairs(Q.search_fuzzy(idx, "rar3", k=10, max_edits=1,
                              max_expansions=50))
    # dv_filter passthrough on the non-bool path
    assert _pairs(search_query_string(idx, "hot0 w010",
                                      dv_filter="role = 'user'")) == \
        _pairs(Q.search(idx, "hot0 w010", k=10,
                        dv_filter="role = 'user'"))
