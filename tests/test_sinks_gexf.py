"""GEXF export parity vs the live reference's save() on a shared fixture
graph (viz colors by label kind, bipartite reification, attvalue shape —
/root/reference/relations.py:894-956)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pytest

from openie_spark.sinks import export_gexf

from .reference_oracle import (
    build_reference_graph,
    make_reltuple,
    reference_available,
)
from .test_graph import _agg

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference not present"
)

Z = np.zeros(8)

ROWS = [
    # (url, sent_id, sent_text, left, rel, right, deprel, lvec, rvec, cluster)
    ("u1", 0, "s1", "government", "signed", "contract", "obj", Z, Z, 0),
    ("u2", 0, "s2", "contract", "_is_a_", "document", "obj", Z, Z, 0),
    ("u3", 0, "s3", "contract", "_relates_to_", "deal", "obj", Z, Z, 1),
]

_COMPARE_KEYS = ("description", "weight", "feat_type", "node_type", "lemmas", "deprel")


def _summary(path):
    ns = {"g": "http://www.gexf.net/1.1draft", "viz": "http://www.gexf.net/1.1draft/viz"}
    root = ET.parse(path).getroot()
    nodes = {}
    for n in root.iter(f"{{{ns['g']}}}node"):
        attrs = {}
        for av in n.iter(f"{{{ns['g']}}}attvalue"):
            attrs[av.get("for")] = av.get("value")
        color = None
        c = n.find(f"{{{ns['viz']}}}color")
        if c is not None:
            color = (c.get("r"), c.get("g"), c.get("b"))
        set_valued = {"description", "feat_type"}
        summary = {
            "label": n.get("label"),
            "color": color,
        }
        for k in _COMPARE_KEYS:
            if k not in attrs:
                continue
            summary[k] = (
                frozenset(attrs[k].split(" | ")) if k in set_valued else attrs[k]
            )
        nodes[n.get("id")] = summary
    edges = sorted(
        (e.get("source"), e.get("target"))
        for e in root.iter(f"{{{ns['g']}}}edge")
    )
    return nodes, edges


def test_gexf_parity_with_reference(spark, tmp_path):
    nodes_df, edges_df = _agg(spark, ROWS)
    ours_path = str(tmp_path / "ours.gexf")
    export_gexf(nodes_df, edges_df, ours_path)

    by_sent = {}
    for (u, sid, st, l, rel, r, dep, lv, rv, c) in ROWS:
        by_sent.setdefault((st, c), []).append(
            make_reltuple(l, rel, r, right_deprel=dep, left_vec=lv, right_vec=rv)
        )
    g = build_reference_graph(
        [(st, c, tuples) for (st, c), tuples in sorted(by_sent.items())]
    )
    ref_path = str(tmp_path / "ref.gexf")
    g.save(ref_path)

    our_nodes, our_edges = _summary(ours_path)
    ref_nodes, ref_edges = _summary(ref_path)

    assert set(our_nodes) == set(ref_nodes)
    for nid, ref in ref_nodes.items():
        got = our_nodes[nid]
        for k in ("label", "color", *_COMPARE_KEYS):
            if k in ref:
                assert got.get(k) == ref[k], (nid, k, got.get(k), ref[k])
    assert our_edges == ref_edges


def test_gexf_relation_colors(spark, tmp_path):
    nodes_df, edges_df = _agg(spark, ROWS)
    path = str(tmp_path / "colors.gexf")
    export_gexf(nodes_df, edges_df, path)
    nodes, _ = _summary(path)
    assert nodes["_is_a_(contract; document)"]["color"] == ("255", "160", "160")
    assert nodes["_relates_to_(contract; deal)"]["color"] == ("160", "255", "160")
    assert nodes["signed(government; contract)"]["color"] == ("0", "0", "255")
    assert nodes["government"]["color"] is None
