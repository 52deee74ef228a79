"""Generate reference-derived goldens for the FULL merge fixpoint (G1).

Runs the READ-ONLY reference implementation's ``RelGraph.merge_relations``
(the sequential greedy fixpoint, /root/reference/relations.py) over the
CONFLUENT merge-fixture corpus (openie_spark.corpus.merge_fixture_*), then
dumps the converged node/edge tables. Because the fixture's merge groups
are disjoint 2-candidate groups (with chain groups whose second-round
group only becomes discoverable after round 1 — discovery order forced),
every merge order converges to the same graph, so the reference output is
an EXACT oracle for our bulk-round fixpoint run with strict_parity=True
(the reference drops in-edges of absorbed nodes — its dead-elif quirk).

Outputs goldens/merge_fixture/{nodes_merged,edges_merged}.parquet and
prints rows+digests (tools/golden_digest.py scheme — same as the pins in
tests/test_entry.py).

Confluence protocol: run under two PYTHONHASHSEED values and diff the
digests — the reference's candidate iteration order is hash-seed-dependent
(Python sets), so identical digests across seeds evidence order-
insensitivity empirically on top of the construction argument.

Usage: python tools/make_merge_goldens.py [n_groups]   (default 125 — the
driver correctness sf's documents count 500 // 4, mirrored by
__spark_entry__._merge_fixture_graph)
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from openie_spark.corpus import STOPWORDS_FIXTURE, merge_fixture_sentences
from openie_spark.parse import template_parse_page
from tools.golden_digest import golden_digest
from tools.make_goldens import norm_edge_key, norm_parts
from tests.reference_oracle import MockSentence, load_reference_relations


def build(n_groups: int):
    relations = load_reference_relations()
    graph = relations.RelGraph()
    n_sents = 0
    for g in range(n_groups):
        for j, sent_text in enumerate(merge_fixture_sentences(g)):
            url = f"https://merge.example.org/g{g}/s{j}"
            for _stext, tokens in template_parse_page(url, sent_text):
                toks5 = [
                    (f, l, u, h, d)
                    for (_i, f, l, u, _x, _f2, h, d, _d2, _m) in tokens
                ]
                sent = MockSentence(toks5, text=_stext)
                sr = relations.SentenceReltuples(
                    sent, {}, additional_relations=True,
                    stopwords=list(STOPWORDS_FIXTURE),
                )
                graph.add_sentence_reltuples(sr, cluster=0)
                n_sents += 1
    print(f"groups={n_groups} sentences={n_sents}", file=sys.stderr)
    graph.merge_relations()

    nx_g = graph._graph
    deg: dict = {}
    for s, t, k, a in nx_g.edges(keys=True, data=True):
        d = deg.setdefault(s, [0, 0, 0, 0])  # out_deg, out_w, in_deg, in_w
        d[0] += 1
        d[1] += a["weight"]
        d = deg.setdefault(t, [0, 0, 0, 0])
        d[2] += 1
        d[3] += a["weight"]
    node_rows = []
    for n, a in nx_g.nodes(data=True):
        d = deg.get(n, [0, 0, 0, 0])
        node_rows.append(
            {
                "lemma_key": norm_parts(n),
                "weight": int(a["weight"]),
                "degree_out": d[0],
                "out_weight": int(d[1]),
                "degree_in": d[2],
                "in_weight": int(d[3]),
            }
        )
    edge_rows = [
        {
            "src": norm_parts(s),
            "dst": norm_parts(t),
            "edge_key": norm_edge_key(k),
            "weight": int(a["weight"]),
        }
        for s, t, k, a in nx_g.edges(keys=True, data=True)
    ]
    return node_rows, edge_rows


def main():
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 125
    out_dir = REPO / "goldens" / "merge_fixture"
    out_dir.mkdir(parents=True, exist_ok=True)
    nodes, edges = build(n_groups)
    for name, rows in (("nodes_merged", nodes), ("edges_merged", edges)):
        cols = {k: [r[k] for r in rows] for k in rows[0]}
        path = out_dir / f"{name}.parquet"
        pq.write_table(pa.table(cols), path)
        print(f"{path} rows={len(rows)} digest={golden_digest(rows)}")


if __name__ == "__main__":
    main()
