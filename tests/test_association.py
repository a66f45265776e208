"""Association module tests (A1-A11): cosine spec vs library values,
usage edges, bipartite projection semantics, collaborator table."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scipi_spark.operators import association as assoc


def test_cosine_py_known_values():
    # identical strings -> 1.0
    assert assoc.cosine_py("graph mining", "graph mining") == pytest.approx(1.0)
    # shorter than k -> 0
    assert assoc.cosine_py("ab", "abcdef") == 0.0
    # disjoint shingles -> 0
    assert assoc.cosine_py("aaaa", "bbbb") == 0.0
    # hand-computed: "abcd" {abc,bcd}, "abce" {abc,bce}; dot=1, norms sqrt2
    assert assoc.cosine_py("abcd", "abce") == pytest.approx(0.5)
    # whitespace runs collapse before shingling
    assert assoc.cosine_py("a  b", "a b") == pytest.approx(1.0)


@settings(max_examples=25, deadline=None)
@given(
    st.text(alphabet="abcde ", min_size=0, max_size=20),
    st.text(alphabet="abcde ", min_size=0, max_size=20),
)
def test_cosine_py_properties(a, b):
    s = assoc.cosine_py(a, b)
    assert 0.0 <= s <= 1.0 + 1e-12
    assert s == pytest.approx(assoc.cosine_py(b, a))  # symmetric


def _pubs(spark):
    rows = [
        ("graph mining methods", ["alice", "bob"], ["graph", "mining"]),
        ("graph mining systems", ["bob", "carol"], ["graph", "systems"]),
        ("unrelated topic", ["dave"], ["other"]),
    ]
    return spark.createDataFrame(
        rows, "title string, authors array<string>, keywords array<string>"
    )


def test_author_keyword_association(spark):
    out = assoc.author_keyword_association(
        _pubs(spark), ["graph mining"], threshold=0.3
    ).collect()
    got = {(r["keyword"], r["author"]): r["sim_sum"] for r in out}
    # both 'graph mining *' titles score > 0.3; bob appears in both
    s1 = assoc.cosine_py("graph mining", "graph mining methods")
    s2 = assoc.cosine_py("graph mining", "graph mining systems")
    assert got[("graph mining", "alice")] == pytest.approx(s1)
    assert got[("graph mining", "bob")] == pytest.approx(s1 + s2)
    assert ("graph mining", "dave") not in got


def test_usage_edges_and_projection(spark):
    edges = assoc.usage_edges(
        _pubs(spark), ["graph", "systems"], usage_threshold=0
    )
    got = {(r["author"], r["keyword"]): r["cnt"] for r in edges.collect()}
    # pub1 and pub2 both carry 'graph'; pub2 carries 'systems' too
    assert got[("bob", "graph")] == 2
    assert got[("alice", "graph")] == 1
    assert got[("carol", "graph")] == 1
    assert got[("carol", "systems")] == 1
    assert ("dave", "other") not in got  # not a defined keyword

    # strict threshold keeps only bob-graph
    strong = assoc.usage_edges(_pubs(spark), ["graph", "systems"], usage_threshold=1)
    assert [(r["author"], r["keyword"]) for r in strong.collect()] == [("bob", "graph")]

    proj = assoc.project_top(edges).collect()
    pairs = [(r["author_a"], r["author_b"]) for r in proj]
    # one projected edge per shared keyword: bob-carol share graph AND systems
    assert pairs.count(("alice", "bob")) == 1
    assert pairs.count(("bob", "alice")) == 1
    assert pairs.count(("bob", "carol")) == 2
    assert pairs.count(("alice", "carol")) == 1


def test_collaborator_table(spark):
    edges = assoc.usage_edges(_pubs(spark), ["graph", "systems"], usage_threshold=0)
    table = {
        r["author"]: (r["collaborators"], r["n_collaborators"])
        for r in assoc.collaborator_table(assoc.project_top(edges)).collect()
    }
    assert table["bob"] == ("alice | carol", 2)
    assert table["alice"] == ("bob | carol", 2)
