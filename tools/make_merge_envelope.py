"""Quantify the reference merge's own ORDER-VARIANCE envelope (VERDICT r4
item 6): the reference's greedy merge_relations is not confluent — which
main absorbs which other depends on scan order — so the p500 tolerance
test's 1%/3% bands were asserted, not derived. This tool DERIVES them:
run the LIVE reference (tests/reference_oracle.py technique, no code
copied) over the identical p500 corpus under ``--perms`` shuffled
sentence-insertion orders (plus the canonical order the golden used), and
record, per permutation: merged node count, edge count, total node
weight, and the normalized node-key set digest; plus the pairwise
key-set symmetric differences across permutations.

The committed envelope (goldens/p500/merge_envelope.json) turns the
tolerance test into a derived bound: our bulk-round distributed result
must sit inside (node count / key sym-diff no farther from the canonical
golden than the reference's own permutations stray).

SentenceReltuples are REBUILT per permutation (construction is
deterministic) rather than reused, because the reference's case-stealing
rule mutates shared token lists (SURVEY E6) — reuse across graphs would
compound the mutation.

Usage: python tools/make_merge_envelope.py [n_pages] [--perms 5]
"""

from __future__ import annotations

import json
import random
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from openie_spark.corpus import STOPWORDS_FIXTURE, expected_clean_text, gen_page
from openie_spark.parse import template_parse_page
from tests.reference_oracle import MockSentence, load_reference_relations
from tools.make_goldens import N_SENTS, SEED, norm_parts


def sentence_specs(n_pages: int):
    """The (url, sent_text, tokens) list of the canonical corpus order."""
    specs = []
    for i in range(n_pages):
        page = gen_page(SEED, i, N_SENTS)
        if page["lang"] != "ru":
            continue
        url = page["url"]
        clean = expected_clean_text(SEED, i, N_SENTS)
        for sent_text, tokens in template_parse_page(url, clean):
            specs.append((url, sent_text, tokens))
    return specs


def run_once(relations, specs, order):
    graph = relations.RelGraph()
    for idx in order:
        _url, sent_text, tokens = specs[idx]
        toks5 = [
            (f, l, u, h, d)
            for (_i, f, l, u, _x, _f2, h, d, _d2, _m) in tokens
        ]
        sent = MockSentence(toks5, text=sent_text)
        sr = relations.SentenceReltuples(
            sent, {}, additional_relations=True, stopwords=list(STOPWORDS_FIXTURE)
        )
        graph.add_sentence_reltuples(sr, cluster=0)
    graph.merge_relations()
    g = graph._graph
    keys = sorted(norm_parts(n) for n in g.nodes)
    total_w = sum(int(a["weight"]) for _n, a in g.nodes(data=True))
    return {
        "n_nodes": g.number_of_nodes(),
        "n_edges": g.number_of_edges(),
        "total_node_weight": total_w,
        "keys": keys,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_pages = int(args[0]) if args else 500
    n_perms = 5
    if "--perms" in sys.argv:
        n_perms = int(sys.argv[sys.argv.index("--perms") + 1])

    relations = load_reference_relations()
    specs = sentence_specs(n_pages)
    print(f"{len(specs)} sentences", file=sys.stderr)

    runs = {}
    canonical = run_once(relations, specs, list(range(len(specs))))
    runs["canonical"] = canonical
    print(
        f"canonical: nodes={canonical['n_nodes']} edges={canonical['n_edges']}",
        file=sys.stderr,
    )
    for p in range(n_perms):
        order = list(range(len(specs)))
        random.Random(1000 + p).shuffle(order)
        r = run_once(relations, specs, order)
        runs[f"perm{p}"] = r
        print(
            f"perm{p}: nodes={r['n_nodes']} edges={r['n_edges']} "
            f"symdiff_vs_canonical="
            f"{len(set(r['keys']) ^ set(canonical['keys']))}",
            file=sys.stderr,
        )

    names = list(runs)
    key_sets = {n: set(runs[n]["keys"]) for n in names}
    pairwise = {
        f"{a}~{b}": len(key_sets[a] ^ key_sets[b])
        for i, a in enumerate(names)
        for b in names[i + 1 :]
    }
    out = {
        "n_pages": n_pages,
        "n_sentences": len(specs),
        "runs": {
            n: {k: v for k, v in runs[n].items() if k != "keys"} for n in names
        },
        "node_count_min": min(runs[n]["n_nodes"] for n in names),
        "node_count_max": max(runs[n]["n_nodes"] for n in names),
        "edge_count_min": min(runs[n]["n_edges"] for n in names),
        "edge_count_max": max(runs[n]["n_edges"] for n in names),
        "total_node_weight_values": sorted(
            {runs[n]["total_node_weight"] for n in names}
        ),
        "max_pairwise_key_symdiff": max(pairwise.values()),
        "max_symdiff_vs_canonical": max(
            len(key_sets[n] ^ key_sets["canonical"]) for n in names
        ),
        "pairwise_key_symdiff": pairwise,
    }
    path = REPO / "goldens" / f"p{n_pages}" / "merge_envelope.json"
    path.write_text(json.dumps(out, indent=1))
    # full per-run key sets: lets the tolerance test assert our result lies
    # inside the reference's own cloud (min-over-perms sym-diff ≤ the
    # reference's internal max pairwise sym-diff), not just near canonical
    keys_path = REPO / "goldens" / f"p{n_pages}" / "merge_envelope_keys.json"
    keys_path.write_text(json.dumps({n: runs[n]["keys"] for n in names}))
    print(json.dumps({k: v for k, v in out.items() if k != "pairwise_key_symdiff"}))


if __name__ == "__main__":
    main()
