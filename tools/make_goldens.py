"""Generate reference-derived golden parquet tables for the driver oracles.

Runs the READ-ONLY reference implementation (/root/reference, imported live
with unavailable deps stubbed — tests/reference_oracle.py technique; no
reference code is copied) over the deterministic synthetic corpus that
``__spark_entry__._kg_pipeline`` uses (pages seed=42, n_sents=6, n_pages =
the sf's documents count), and writes:

- goldens/p500/triples.parquet       — reference SentenceReltuples output
  per (url, sent_id): the P/R=1.0 contract surface. Oracle for kg_triples
  (direct SELECT) and kg_nodes/kg_edges (A1/A2 aggregation as SQL).
- goldens/p500/nodes_merged.parquet  — reference RelGraph after
  merge_relations(), node rows with degree/weight aggregates.
- goldens/p500/edges_merged.parquet  — reference merged edge rows.

Merged-key normalization: the reference joins Python *sets* with " | " when
building merged labels/keys, so part order within each " | " group is
process-nondeterministic (hash randomization). Every such field is
normalized here (and identically on the Spark side) by sorting the parts.

Usage:  python tools/make_goldens.py [n_pages]   (default 500)
Prints one line per table: path, rows, content digest (order-insensitive).
Run under two PYTHONHASHSEED values and diff the digests to prove the
goldens are hash-seed-independent before trusting them.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from openie_spark.corpus import STOPWORDS_FIXTURE, expected_clean_text, gen_page
from openie_spark.parse import template_parse_page
from tests.reference_oracle import MockSentence, load_reference_relations

SEED = 42
N_SENTS = 6
IS_A = "_is_a_"
RELATES_TO = "_relates_to_"


def norm_parts(s: str) -> str:
    """Sort ' | '-joined set parts (reference set-join order is random)."""
    return " | ".join(sorted(s.split(" | ")))


def norm_edge_key(key: str) -> str:
    """Normalize each ' | ' group inside an edge key's 'lemmas + deprel'."""
    if " + " not in key:
        return norm_parts(key)
    head, _, tail = key.rpartition(" + ")
    return norm_parts(head) + " + " + norm_parts(tail)


def build(n_pages: int):
    relations = load_reference_relations()

    triple_rows = []
    graph = relations.RelGraph()
    n_ru = 0
    for i in range(n_pages):
        page = gen_page(SEED, i, N_SENTS)
        if page["lang"] != "ru":  # clean_pages(lang="ru") filter
            continue
        n_ru += 1
        url = page["url"]
        clean = expected_clean_text(SEED, i, N_SENTS)
        for sent_id, (sent_text, tokens) in enumerate(
            template_parse_page(url, clean)
        ):
            toks5 = [(f, l, u, h, d) for (_i, f, l, u, _x, _f2, h, d, _d2, _m) in tokens]
            sent = MockSentence(toks5, text=sent_text)
            sr = relations.SentenceReltuples(
                sent, {}, additional_relations=True,
                stopwords=list(STOPWORDS_FIXTURE),
            )
            for t in sr._reltuples:
                triple_rows.append(
                    {
                        "url": url,
                        "sent_id": sent_id,
                        "sent_text": sent_text,
                        "left_arg": t.left_arg,
                        "left_arg_lemmas": t.left_arg_lemmas,
                        "relation": t.relation,
                        "relation_lemmas": t.relation_lemmas,
                        "right_arg": t.right_arg,
                        "right_arg_lemmas": t.right_arg_lemmas,
                        "right_deprel": t.right_deprel,
                    }
                )
            graph.add_sentence_reltuples(sr, cluster=0)

    print(f"pages={n_pages} ru={n_ru} triples={len(triple_rows)}", file=sys.stderr)
    print("merging (reference fixpoint, pure python)...", file=sys.stderr)
    graph.merge_relations()

    nx_g = graph._graph
    node_rows = []
    deg = {}
    for s, t, k, a in nx_g.edges(keys=True, data=True):
        d = deg.setdefault(s, [0, 0, 0, 0])  # out_deg, out_w, in_deg, in_w
        d[0] += 1
        d[1] += a["weight"]
        d = deg.setdefault(t, [0, 0, 0, 0])
        d[2] += 1
        d[3] += a["weight"]
    for n, a in nx_g.nodes(data=True):
        d = deg.get(n, [0, 0, 0, 0])
        node_rows.append(
            {
                "lemma_key": norm_parts(n),
                "label": norm_parts(a.get("label", "")),
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
            "label": norm_parts(a["label"]),
            "weight": int(a["weight"]),
        }
        for s, t, k, a in nx_g.edges(keys=True, data=True)
    ]
    return triple_rows, node_rows, edge_rows


def digest(rows) -> str:
    h = hashlib.sha256()
    for r in sorted(repr(sorted(d.items())) for d in rows):
        h.update(r.encode())
    return h.hexdigest()[:16]


def write(rows, path: Path):
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    pq.write_table(pa.table(cols), path)


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    out_dir = REPO / "goldens" / f"p{n_pages}"
    out_dir.mkdir(parents=True, exist_ok=True)
    triples, nodes, edges = build(n_pages)
    for name, rows in (("triples", triples), ("nodes_merged", nodes), ("edges_merged", edges)):
        path = out_dir / f"{name}.parquet"
        write(rows, path)
        print(f"{path} rows={len(rows)} digest={digest(rows)}")


if __name__ == "__main__":
    main()
