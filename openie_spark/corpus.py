"""Deterministic synthetic Common-Crawl-style corpus + the template grammar
shared with the parser seam.

The sandbox has no UDPipe model (/root/reference/udpipe_model.py needs
ufal.udpipe + a 40 MB .udpipe file), so the engine's Parser seam ships a
deterministic grammar parser (openie_spark.parse.TemplateParser) and this
module generates pages whose sentences come from that grammar — every
generated sentence has a known-correct dependency parse, which makes full
end-to-end correctness checkable without any model download.

Pages exercise every reference cleaning path (FIXTURES.md §1): html tags,
*literal* ``\\n`` two-char sequences, HTML entities, headline lines without
final punctuation, ``.hdr`` / ``.sts`` / ``.htm`` shells, cp1251 vs utf-8
bytes, and non-target languages for the lang filter.

Everything is a pure function of (seed, index) — regenerating at any scale
or parallelism yields identical rows, which is what makes the two-cluster
scaling benchmark read the same input at both parallelism levels.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import random
from typing import List, Tuple

# ---- template grammar -------------------------------------------------------
# Each pattern: (upos sequence, heads, deprels). The upos sequence is the
# pattern key the parser recovers structure from; all sequences are unique.

PATTERNS: dict = {
    ("NOUN", "VERB", "NOUN"): ((2, 0, 2), ("nsubj", "root", "obj")),
    ("NOUN", "VERB", "NOUN", "ADP", "NOUN"): (
        (2, 0, 2, 5, 2),
        ("nsubj", "root", "obj", "case", "obl"),
    ),
    ("NOUN", "PART", "AUX", "NOUN"): (
        (4, 4, 4, 0),
        ("nsubj", "advmod", "cop", "root"),
    ),
    ("NOUN", "VERB", "PART", "VERB", "NOUN"): (
        (2, 0, 4, 2, 4),
        ("nsubj", "root", "mark", "xcomp", "obj"),
    ),
    ("NOUN", "VERB", "NOUN", "CCONJ", "VERB", "NOUN"): (
        (2, 0, 2, 5, 2, 5),
        ("nsubj", "root", "obj", "cc", "conj", "obj"),
    ),
    ("NOUN", "ADP", "NOUN", "VERB", "NOUN"): (
        (4, 3, 1, 0, 4),
        ("nsubj", "case", "nmod", "root", "obj"),
    ),
    ("PROPN", "PROPN", "VERB", "NOUN", "ADP", "NOUN"): (
        (3, 1, 0, 3, 6, 3),
        ("nsubj", "flat:name", "root", "obj", "case", "obl"),
    ),
}

# form → (lemma, upos). Forms are unique across classes so the lexicon is a
# function; a few inflected forms exercise form≠lemma paths.
NOUNS = [
    ("контракт", "контракт"), ("компания", "компания"), ("договор", "договор"),
    ("правительство", "правительство"), ("бюджет", "бюджет"), ("банк", "банк"),
    ("завод", "завод"), ("документ", "документ"), ("город", "город"),
    ("столица", "столица"), ("акции", "акция"), ("облигации", "облигация"),
    ("налоги", "налог"), ("проект", "проект"), ("директор", "директор"),
    ("министр", "министр"), ("совет", "совет"), ("отчет", "отчет"),
    ("регион", "регион"), ("программа", "программа"),
]
PROPNS = [
    ("иванов", "иванов"), ("петров", "петров"), ("сидоров", "сидоров"),
    ("москва", "москва"), ("анна", "анна"), ("сергей", "сергей"),
]
VERBS = [
    ("подписал", "подписать"), ("одобрил", "одобрить"), ("купил", "купить"),
    ("продал", "продать"), ("представил", "представить"),
    ("утвердил", "утвердить"), ("отклонил", "отклонить"), ("хочет", "хотеть"),
    ("планирует", "планировать"), ("поддержал", "поддержать"),
]
ADPS = [("с", "с"), ("в", "в"), ("для", "для"), ("от", "от")]
PARTS = [("не", "не"), ("чтобы", "чтобы")]
AUXS = [("был", "быть"), ("является", "являться")]
CCONJS = [("и", "и"), ("но", "но")]

# ---- long-tail vocabulary ---------------------------------------------------
# A handful of hand-written words (above) forms the Zipf head; a generated
# long tail gives the corpus realistic key cardinality. With only ~40 lemmas
# the node/edge groupBys would have ~40 reduce keys — zero exploitable
# parallelism and description sets in the millions per key at scale, which
# is not what a web corpus looks like. Tail words are deterministic syllable
# compositions (seed-free, index-addressed), disjoint from the head by the
# trailing index syllableization.

_SYLLABLES = [
    "ба", "во", "га", "ди", "жу", "зе", "ки", "ло", "му", "ни",
    "по", "ру", "се", "ти", "фа", "хо", "це", "ша", "эм", "ют",
]


def _tail_word(prefix: str, i: int) -> str:
    parts = [prefix]
    n = i
    for _ in range(3):
        parts.append(_SYLLABLES[n % len(_SYLLABLES)])
        n //= len(_SYLLABLES)
    return "".join(parts)


N_TAIL_NOUNS = 800
N_TAIL_PROPNS = 200
N_TAIL_VERBS = 90

TAIL_NOUNS = [(_tail_word("кр", i), _tail_word("кр", i)) for i in range(N_TAIL_NOUNS)]
TAIL_PROPNS = [(_tail_word("пр", i), _tail_word("пр", i)) for i in range(N_TAIL_PROPNS)]
TAIL_VERBS = [(_tail_word("гл", i), _tail_word("гл", i)) for i in range(N_TAIL_VERBS)]

NOUNS_ALL = NOUNS + TAIL_NOUNS
PROPNS_ALL = PROPNS + TAIL_PROPNS
VERBS_ALL = VERBS + TAIL_VERBS

_BY_UPOS = {
    "NOUN": NOUNS_ALL,
    "PROPN": PROPNS_ALL,
    "VERB": VERBS_ALL,
    "ADP": ADPS,
    "PART": PARTS,
    "AUX": AUXS,
    "CCONJ": CCONJS,
}

LEXICON: dict = {}
for _upos, _words in _BY_UPOS.items():
    for _form, _lemma in _words:
        assert _form not in LEXICON, f"lexicon collision: {_form}"
        LEXICON[_form] = (_lemma, _upos)

PATTERN_BY_UPOS_SEQ = {seq: spec for seq, spec in PATTERNS.items()}
_PATTERN_LIST = sorted(PATTERNS.items())

STOPWORDS_FIXTURE = ["с", "в", "для", "от", "не", "чтобы", "и", "но", "the", "he"]


def _rng_for(seed: int, *parts) -> random.Random:
    h = hashlib.sha256(("|".join(map(str, (seed, *parts)))).encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def gen_sentence(seed: int, page_i: int, sent_i: int) -> Tuple[str, List[tuple]]:
    """→ (sentence_text, tokens) with tokens = (form, lemma, upos, head, deprel).

    A small hot-vocabulary skew is built in: ~20% of sentences draw their
    nouns from the first 4 noun entries, producing Zipf-ish hot lemma keys so
    the aggregation/salting paths see realistic skew even at sandbox scale.
    """
    rng = _rng_for(seed, page_i, sent_i)
    upos_seq, (heads, deprels) = _PATTERN_LIST[rng.randrange(len(_PATTERN_LIST))]
    hot = rng.random() < 0.2
    tokens = []
    for pos_i, upos in enumerate(upos_seq):
        bank = _BY_UPOS[upos]
        if hot and upos == "NOUN":
            form, lemma = bank[rng.randrange(4)]
        else:
            form, lemma = bank[rng.randrange(len(bank))]
        tokens.append((form, lemma, upos, heads[pos_i], deprels[pos_i]))
    text = " ".join(t[0] for t in tokens) + "."
    return text, tokens


def expected_clean_text(seed: int, page_i: int, n_sents: int) -> str:
    """The cleaned text our pipeline must produce for page ``page_i`` —
    derivable because generation is deterministic."""
    return "".join(
        gen_sentence(seed, page_i, j)[0] + " " for j in range(n_sents)
    ).rstrip(" ")


def gen_page(seed: int, page_i: int, n_sents: int = 6) -> dict:
    """One pages-table row. Each page's html wraps the sentences in one of
    the reference's source formats, plus tag/entity/literal-\\n noise that
    the cleaners must strip to recover exactly ``expected_clean_text``."""
    rng = _rng_for(seed, page_i, "page")
    sents = [gen_sentence(seed, page_i, j)[0] for j in range(n_sents)]
    body = " ".join(sents)

    lang = "ru" if rng.random() < 0.85 else rng.choice(["en", "es", "zh"])
    fmt = rng.choice(["plain", "plain", "htm", "hdr", "sts"])
    if fmt == "hdr":
        raw = "HEADER=1\nTEXT_THEMAN_ANNO=" + body + "\nFOOTER=0"
        url = f"https://news.example.org/{seed}/{page_i}.hdr"
    elif fmt == "sts":
        raw = f"1 2 3 4 5 6 {body}"
        url = f"https://news.example.org/{seed}/{page_i}.sts"
    elif fmt == "htm":
        raw = f"id = {page_i}\n<html><body><p>{body}</p></body></html>"
        url = f"https://news.example.org/{seed}/{page_i}.htm"
    else:
        raw = f"<p>{body}</p>"
        url = f"https://news.example.org/{seed}/{page_i}"
    # entity + literal-backslash-n noise on a deterministic subset; sts is
    # excluded because an entity inside its 6 leading numeric columns makes
    # the reference's (\d+\s+){6} extractor (correctly) drop the line
    if rng.random() < 0.3 and fmt != "sts":
        raw = raw.replace(" ", "&nbsp;", 1)
    if rng.random() < 0.3 and fmt == "plain":
        raw = raw.replace("</p>", "</p>\\n\\n", 1)

    encoding = "cp1251" if rng.random() < 0.3 else "utf-8"
    html_bytes = raw.encode(encoding, errors="replace")
    ts = dt.datetime(2026, 1, 1) + dt.timedelta(
        days=page_i % 60, seconds=(page_i * 7919) % 86400
    )
    return {
        "url": url,
        "warc_ts": ts,
        "html": html_bytes,
        "text": None,
        "lang": lang,
    }


def gen_pages_rows(n_pages: int, seed: int = 42, n_sents: int = 6) -> List[dict]:
    return [gen_page(seed, i, n_sents) for i in range(n_pages)]


PAGES_SCHEMA_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"

# ---- dedup benchmark corpus -------------------------------------------------
# The driver-provided documents tables draw from a ~20-word vocabulary, so
# every document shingle-collides with every other — a worst case real web
# text never exhibits, which makes MinHash benchmarks measure pathology
# instead of the operating point. This corpus has a Zipfian vocabulary
# (head + generated long tail, like real webtext) and planted duplicates:
# per 10-doc block, doc 9 is an exact copy of doc 8's base and doc 8 is a
# near-dup of doc 0 (every 25th token replaced), so dedup precision/recall
# is measurable and candidate sets stay realistic.

_DEDUP_VOCAB = [w for w, _ in NOUNS_ALL + PROPNS_ALL + VERBS_ALL]


def _zipf_idx(rng: random.Random, n: int) -> int:
    # heavy-tailed rank draw: p(rank) ~ rank^-1.2, capped at n-1
    return min(int(rng.paretovariate(1.2)) - 1, n - 1)


def _gen_doc_tokens(seed: int, i: int) -> List[str]:
    rng = _rng_for(seed, "doc", i)
    n_tokens = 60 + rng.randrange(120)
    return [_DEDUP_VOCAB[_zipf_idx(rng, len(_DEDUP_VOCAB))] for _ in range(n_tokens)]


def gen_dedup_doc(seed: int, i: int) -> dict:
    block = i - (i % 10)
    if i % 10 == 9:  # exact duplicate of the block head
        toks = _gen_doc_tokens(seed, block)
    elif i % 10 == 8:  # near-duplicate: every 25th token replaced
        toks = _gen_doc_tokens(seed, block)
        rng = _rng_for(seed, "mut", i)
        for j in range(0, len(toks), 25):
            toks[j] = _DEDUP_VOCAB[rng.randrange(len(_DEDUP_VOCAB))]
    else:
        toks = _gen_doc_tokens(seed, i)
    return {"doc_id": i, "text": " ".join(toks), "source": f"s{i % 7}"}


DEDUP_DOCS_SCHEMA_DDL = "doc_id long, text string, source string"


def dedup_docs_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic dedup-benchmark corpus (see block comment)."""
    from pyspark.sql import Row

    sc = spark.sparkContext
    partitions = partitions or max(2, sc.defaultParallelism)
    rdd = sc.parallelize(range(n_docs), partitions).map(
        lambda i: Row(**gen_dedup_doc(seed, i))
    )
    return spark.createDataFrame(rdd, schema=DEDUP_DOCS_SCHEMA_DDL)


def pages_df(spark, n_pages: int, seed: int = 42, n_sents: int = 6, partitions: int | None = None):
    """Distributed deterministic generation: the page index range is
    parallelized and each partition generates its own rows — no driver-side
    materialization, so the same call scales to any n_pages."""
    from pyspark.sql import Row

    sc = spark.sparkContext
    partitions = partitions or max(2, sc.defaultParallelism)
    rdd = sc.parallelize(range(n_pages), partitions).map(
        lambda i: Row(**gen_page(seed, i, n_sents))
    )
    return spark.createDataFrame(rdd, schema=PAGES_SCHEMA_DDL)


# ---- merge-fixpoint fixture corpus ------------------------------------------
# A corpus whose merge fixpoint is provably CONFLUENT, so the full G1 loop
# can be oracled EXACTLY against the reference's sequential greedy merge
# (the p500 corpus is not confluent — measured 1831-vs-1826-node band).
# Construction: per-group disjoint vocabulary, and within each group exactly
# one 2-candidate merge group (anchor a → {b, c} under one verb key, from
# two different sentences). With disjoint 2-candidate groups every merge
# order produces the same graph. Chain groups (every 4th) additionally plant
# a SECOND-round merge that only becomes discoverable after round 1: the
# absorbed candidate's out-edge (c→x) re-points onto the main (b), which
# already has an out-edge (b→y) under the same verb key — forming a new
# 2-candidate group {x, y} under the merged node. Before round 1 neither
# (b,·) nor (c,·) has two targets, so the discovery order is forced and the
# chain stays confluent while exercising the ITERATED fixpoint, not just a
# single bulk round.

MERGE_FX_NOUNS_PER_GROUP = 5
MERGE_FX_MAX_GROUPS = N_TAIL_NOUNS // MERGE_FX_NOUNS_PER_GROUP


def merge_fixture_sentences(g: int) -> List[str]:
    """The sentences of merge-fixture group ``g`` (see block comment)."""
    assert 0 <= g < MERGE_FX_MAX_GROUPS, g
    base = MERGE_FX_NOUNS_PER_GROUP * g
    a, b, c, x, y = (TAIL_NOUNS[base + j][0] for j in range(5))
    v = VERBS_ALL[(2 * g) % len(VERBS_ALL)][0]
    w = VERBS_ALL[(2 * g + 1) % len(VERBS_ALL)][0]
    sents = [f"{a} {v} {b}.", f"{a} {v} {c}."]
    if g % 4 == 3:  # chain group → second fixpoint round
        sents += [f"{c} {w} {x}.", f"{b} {w} {y}."]
    return sents


def merge_fixture_pages(g: int) -> List[dict]:
    """Pages-table rows for group ``g``: one sentence per page (so the
    shared-sentence exclusion never fires inside a group), plain format,
    utf-8, lang ru."""
    rows = []
    for j, sent in enumerate(merge_fixture_sentences(g)):
        rows.append(
            {
                "url": f"https://merge.example.org/g{g}/s{j}",
                "warc_ts": dt.datetime(2026, 1, 1) + dt.timedelta(days=g % 60),
                "html": f"<p>{sent}</p>".encode("utf-8"),
                "text": None,
                "lang": "ru",
            }
        )
    return rows


def merge_fixture_pages_df(spark, n_groups: int, partitions: int | None = None):
    """Distributed deterministic merge-fixture corpus."""
    from pyspark.sql import Row

    sc = spark.sparkContext
    partitions = partitions or max(2, sc.defaultParallelism)
    rdd = sc.parallelize(range(n_groups), partitions).flatMap(
        lambda g: [Row(**r) for r in merge_fixture_pages(g)]
    )
    return spark.createDataFrame(rdd, schema=PAGES_SCHEMA_DDL)


# ---- clustering fixture -----------------------------------------------------
# M2 (KMeans sweep + silhouette selection) driver-oracle fixture: n_blobs
# extremely separated gaussian blobs (center distance 100, intra-blob noise
# 0.01), large enough to clear MIN_CLUSTER_SIZE·2 sentences. The separation
# makes the optimal partition UNIQUE and the silhouette sweep's argmax
# (k = n_blobs) unambiguous, so any correct KMeans — Spark ML's seeded
# k-means|| and the golden generator's pure-numpy Lloyd's — converges to
# the same blob assignment; comparisons canonicalize cluster ids to the
# min-url member (label-permutation invariant).

CLUSTER_FX_BLOBS = 5
CLUSTER_FX_PER_BLOB = 60
CLUSTER_FX_DIM = 8


def clustering_fixture_rows(
    n_blobs: int = CLUSTER_FX_BLOBS,
    per_blob: int = CLUSTER_FX_PER_BLOB,
    dim: int = CLUSTER_FX_DIM,
    seed: int = 42,
) -> List[tuple]:
    """[(url, sent_id, sent_vec)] — pure function of the parameters."""
    assert n_blobs <= dim
    rows = []
    for b in range(n_blobs):
        for i in range(per_blob):
            rng = _rng_for(seed, "blob", b, i)
            vec = [0.0] * dim
            vec[b] = 100.0
            vec = [v + rng.gauss(0.0, 0.01) for v in vec]
            rows.append((f"https://cluster.example.org/{b * per_blob + i:04d}", 0, vec))
    return rows
