"""Deterministic synthetic webtext generator (FIXTURES.md §1).

Mirrors the reference's benchmark simulators
(/root/reference/benchmark/simulate/README.md:1-35):
- seed docs per cluster (analog of simulate_longSequence seed sequences)
- near-duplicate members mutated at per-cluster token rates straddling the
  clustering threshold
- containment duplicates = prefix/slice cuts (analog of
  create_containment_bacteria)
- exact duplicates, singletons, short docs (minLen analog), and one hot
  boilerplate cluster (LSH hot-band adversary)

Every document is derived solely from (seed, doc_id) via
``numpy.random.default_rng([seed, salt, doc_id])`` — generation is order- and
partition-independent, so the Spark path (mapInPandas over spark.range) and
the local pandas path produce byte-identical corpora.

Schema: url string, warc_ts timestamp, html binary, text string, lang string
(+ truth columns truth_cluster, kind, mutation_rate kept in a side table).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)
_VOCAB = [f"tok{i:04d}" for i in range(4096)]
# token-mutation rates calibrated so Mash distances straddle d=0.05 at
# k=21 char shingles: r=0.30 -> D~0.048 (boundary), r>=0.45 -> D>0.06 (split)
_MUTATION_RATES = [0.01, 0.05, 0.15, 0.30, 0.45, 0.60]
_LANGS = ["de", "fr", "und"]
_PARA_TOKENS = 60


@dataclass(frozen=True)
class WebtextParams:
    seed: int = 42
    num_clusters: int = 20          # C
    members_per_cluster: int = 10   # m
    num_singletons: int = 40
    num_short: int = 10
    hot_cluster_size: int = 30      # docs sharing a boilerplate block
    min_doc_tokens: int = 300
    max_doc_tokens: int = 1500
    short_doc_tokens: int = 5
    # effective vocabulary size.  4096 (the default, = len(_VOCAB)) keeps
    # every historical corpus byte-identical; large-scale stress corpora use
    # a bigger vocab so cross-doc shingle density scales like real webtext
    # (at 1M docs a 4096-token vocab puts every token bigram in ~16 docs --
    # pathological common-phrase density).  Sizes above 4096 extend the
    # token name sequence (tok0000..tokN, zero-padded to >=4 digits).
    vocab_size: int = 4096

    @property
    def num_docs(self) -> int:
        return (self.num_clusters * self.members_per_cluster
                + self.num_singletons + self.num_short + self.hot_cluster_size)


# scale presets (FIXTURES.md: t1 smoke, t2 correctness, bench throughput)
T1 = WebtextParams(num_clusters=20, members_per_cluster=10)
T2 = WebtextParams(num_clusters=200, members_per_cluster=30,
                   num_singletons=400, num_short=50, hot_cluster_size=100)


def bench_params(num_clusters: int = 2000, members: int = 50) -> WebtextParams:
    return WebtextParams(num_clusters=num_clusters, members_per_cluster=members,
                         num_singletons=num_clusters * 2,
                         num_short=num_clusters // 4,
                         hot_cluster_size=500)


# --------------------------------------------------------------------- layout

def _doc_spec(doc_id: int, p: WebtextParams) -> tuple[str, int, int]:
    """(kind, cluster, member_idx). Clusters by kind:
    cluster % 10 == 5 -> exact-dup cluster; % 10 == 7 -> containment cluster;
    otherwise near-dup cluster."""
    n_members = p.num_clusters * p.members_per_cluster
    if doc_id < n_members:
        c, i = divmod(doc_id, p.members_per_cluster)
        if i == 0:
            return "seed", c, i
        if c % 10 == 5:
            return "exact", c, i
        if c % 10 == 7:
            return "containment", c, i
        return "near", c, i
    doc_id -= n_members
    if doc_id < p.num_singletons:
        return "singleton", p.num_clusters + doc_id, 0
    doc_id -= p.num_singletons
    if doc_id < p.num_short:
        return "short", -1, doc_id
    doc_id -= p.num_short
    return "hot", p.num_clusters + p.num_singletons, doc_id  # one hot cluster


def _rng(seed: int, salt: int, key: int) -> np.random.Generator:
    return np.random.default_rng([seed, salt, key])


def _vocab_word(t: int) -> str:
    return _VOCAB[t] if t < len(_VOCAB) else f"tok{t:04d}"


def _seed_tokens(p: WebtextParams, cluster: int) -> np.ndarray:
    rng = _rng(p.seed, 1, cluster)
    n = int(rng.integers(p.min_doc_tokens, p.max_doc_tokens + 1))
    return rng.integers(0, p.vocab_size, size=n)


def _cluster_rate(p: WebtextParams, cluster: int) -> float:
    # round-robin over the calibrated rates: guarantees every rate appears
    # at every fixture scale (rates straddle the d=0.05 threshold)
    return float(_MUTATION_RATES[cluster % len(_MUTATION_RATES)])


def _mutate(tokens: np.ndarray, rate: float, rng: np.random.Generator,
            vocab_size: int = len(_VOCAB)) -> np.ndarray:
    """Token-level substitutions / insertions / deletions at ``rate``."""
    out: list[int] = []
    ops = rng.random(len(tokens))
    kinds = rng.integers(0, 3, size=len(tokens))
    subs = rng.integers(0, vocab_size, size=len(tokens))
    for i, t in enumerate(tokens):
        if ops[i] >= rate:
            out.append(int(t))
            continue
        k = kinds[i]
        if k == 0:      # substitution
            out.append(int(subs[i]))
        elif k == 1:    # insertion (keep original too)
            out.append(int(t))
            out.append(int(subs[i]))
        # k == 2: deletion (emit nothing)
    return np.asarray(out if out else [0], dtype=np.int64)


def _render(tokens: np.ndarray) -> str:
    words = [_vocab_word(int(t)) for t in tokens]
    paras = [" ".join(words[i:i + _PARA_TOKENS])
             for i in range(0, len(words), _PARA_TOKENS)]
    return "\n\n".join(paras)


_BOILERPLATE_TOKENS = 200


def generate_doc(doc_id: int, p: WebtextParams) -> dict:
    kind, cluster, member = _doc_spec(doc_id, p)
    rng = _rng(p.seed, 3, doc_id)
    if kind in ("seed", "exact", "near", "containment"):
        base = _seed_tokens(p, cluster)
        rate = _cluster_rate(p, cluster)
        if kind == "seed" or kind == "exact":
            toks = base
        elif kind == "near":
            toks = _mutate(base, rate, rng, p.vocab_size)
        else:  # containment: random 10-90% slice of the seed
            frac = 0.1 + 0.8 * rng.random()
            n = max(int(len(base) * frac), 20)
            start = int(rng.integers(0, len(base) - n + 1))
            toks = base[start:start + n]
    elif kind == "singleton":
        toks = _seed_tokens(p, cluster)
        rate = 0.0
    elif kind == "short":
        toks = _rng(p.seed, 4, doc_id).integers(0, p.vocab_size, size=p.short_doc_tokens)
        rate = 0.0
    else:  # hot: shared boilerplate + unique tail
        boiler = _rng(p.seed, 5, 0).integers(0, p.vocab_size, size=_BOILERPLATE_TOKENS)
        unique = rng.integers(0, p.vocab_size, size=300)
        toks = np.concatenate([boiler, unique])
        rate = 0.0

    text = _render(toks)
    site = doc_id % 1000
    url = f"https://site{site:04d}.example/{doc_id:08d}"
    lang = "en" if doc_id % 10 < 9 else _LANGS[(doc_id // 10) % 3]
    html = render_html(url, text)
    return {
        "url": url,
        "doc_id": doc_id,
        "warc_ts": _EPOCH + timedelta(seconds=17 * doc_id),
        "html": html,
        "text": text,
        "lang": lang,
        "truth_cluster": cluster if kind != "short" else -1,
        "kind": kind,
        "mutation_rate": rate if kind == "near" else 0.0,
    }


def render_html(url: str, text: str) -> bytes:
    """Deterministic HTML template wrap (FIXTURES.md §1): the reference
    extractor's exact inverse lives in operators/extract.py."""
    paras = "".join(f"<p>{p}</p>" for p in text.split("\n\n"))
    return (f"<html><head><title>{url}</title></head>"
            f"<body>{paras}</body></html>").encode("utf-8")


def generate_pandas(p: WebtextParams, start: int = 0,
                    end: int | None = None) -> pd.DataFrame:
    end = p.num_docs if end is None else end
    return pd.DataFrame([generate_doc(i, p) for i in range(start, end)])


def generate_spark(spark, p: WebtextParams):
    """Distributed generation: spark.range -> mapInPandas (order/partition
    independent by construction)."""
    schema = ("url string, doc_id long, warc_ts timestamp, html binary, "
              "text string, lang string, truth_cluster long, kind string, "
              "mutation_rate double")

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([generate_doc(int(i), p) for i in pdf["id"]])

    return spark.range(p.num_docs).mapInPandas(gen, schema=schema)
