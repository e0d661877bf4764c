"""Deterministic synthetic Common-Crawl-shaped corpus with planted duplicate
clusters (SURVEY.md §2.A A5, §7 M6).

Generates the contract input table `pages(url, warc_ts, html, text, lang)`
[BASELINE.json:15] plus a `labels(url1, url2, label)` ground-truth table:

  * K planted clusters, each a template document with m perturbed copies —
    perturbations (adjacent-token swap, single-char typo, token drop) stay
    within the Jaro-Winkler/Jaccard radius the scorer thresholds on, and
    keep ≥1 shared rare anchor token so blocking recall is exact.
  * singleton noise documents sharing the global vocabulary (hard negatives
    for blocking: they collide on common tokens but score below τ).
  * html rendered by extract.render_page so extract(html) == text
    byte-identically (the per-row invariant).

Pure Python + pyarrow, seed-fixed, no Spark required (the generator is a
fixture builder, not a pipeline stage). Runtime uses no wall-clock and no
unseeded randomness — reruns are byte-stable.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from .extract import render_page

VOCAB = [
    "data", "spark", "query", "table", "index", "merge", "filter", "record",
    "entity", "match", "cluster", "block", "token", "score", "crawl", "page",
    "linkage", "vector", "batch", "shuffle", "partition", "join", "hash",
    "window", "stream", "column", "schema", "engine", "plan", "stage",
]
LANGS = ["en", "en", "en", "fr", "es", "de", "zh"]
BASE_TS = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _typo(rng: random.Random, tok: str) -> str:
    if len(tok) < 3:
        return tok + "x"
    i = rng.randrange(1, len(tok) - 1)
    return tok[:i] + chr(ord("a") + rng.randrange(26)) + tok[i + 1 :]


def _perturb(rng: random.Random, tokens: list[str]) -> list[str]:
    toks = list(tokens)
    op = rng.random()
    if op < 0.4 and len(toks) > 2:  # adjacent swap
        i = rng.randrange(len(toks) - 1)
        toks[i], toks[i + 1] = toks[i + 1], toks[i]
    elif op < 0.8:  # typo
        i = rng.randrange(1, len(toks))  # never the anchor (position 0)
        toks[i] = _typo(rng, toks[i])
    elif len(toks) > 4:  # drop
        toks.pop(rng.randrange(1, len(toks)))
    return toks


def generate_corpus(
    out_dir: str,
    n_clusters: int = 40,
    cluster_size: int = 4,
    n_singletons: int = 200,
    doc_tokens: int = 18,
    seed: int = 42,
    n_neg_labels_per_cluster: int = 6,
    skew_token: str | None = None,
    skew_frac: float = 0.0,
) -> dict[str, str]:
    """Write pages.parquet + labels.parquet under out_dir; return paths.

    skew_token/skew_frac plant a head-of-Zipf hot token into ~skew_frac of
    all documents (the M4 skew stress fixture) without changing clusters.
    """
    rng = random.Random(seed)
    urls: list[str] = []
    texts: list[str] = []
    langs: list[str] = []
    tss: list[dt.datetime] = []
    cluster_of: dict[str, int] = {}

    def add_doc(url: str, tokens: list[str], cluster: int) -> None:
        if skew_token and rng.random() < skew_frac:
            tokens = [*tokens, skew_token]
        urls.append(url)
        texts.append(" ".join(tokens))
        langs.append(rng.choice(LANGS))
        tss.append(BASE_TS + dt.timedelta(seconds=rng.randrange(365 * 24 * 3600)))
        cluster_of[url] = cluster

    for c in range(n_clusters):
        # rare anchor token unique to the cluster → exact blocking recall
        anchor = f"anchor{c:04d}q"
        template = [anchor] + [rng.choice(VOCAB) for _ in range(doc_tokens - 1)]
        for m in range(cluster_size):
            toks = template if m == 0 else _perturb(rng, template)
            add_doc(f"https://src{c % 20}.example.com/c{c}/m{m}", toks, c)

    for s in range(n_singletons):
        toks = [rng.choice(VOCAB) for _ in range(doc_tokens)]
        add_doc(f"https://src{s % 20}.example.com/s/{s}", toks, -1 - s)

    # labels: all intra-cluster positives + seeded cross negatives
    pos: list[tuple[str, str, bool]] = []
    by_cluster: dict[int, list[str]] = {}
    for u, c in cluster_of.items():
        if c >= 0:
            by_cluster.setdefault(c, []).append(u)
    for c, members in sorted(by_cluster.items()):
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pos.append((ms[i], ms[j], True))
    neg: list[tuple[str, str, bool]] = []
    all_urls = sorted(cluster_of)
    for c in sorted(by_cluster):
        for _ in range(n_neg_labels_per_cluster):
            u1 = rng.choice(by_cluster[c])
            u2 = rng.choice(all_urls)
            while cluster_of[u2] == c:
                u2 = rng.choice(all_urls)
            a, b = sorted((u1, u2))
            neg.append((a, b, False))

    os.makedirs(out_dir, exist_ok=True)
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array([render_page(t, u) for t, u in zip(texts, urls)], pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    pages_path = os.path.join(out_dir, "pages.parquet")
    pq.write_table(pages, pages_path)

    lab = sorted(set(pos) | set(neg))
    labels = pa.table(
        {
            "url1": pa.array([x[0] for x in lab], pa.string()),
            "url2": pa.array([x[1] for x in lab], pa.string()),
            "label": pa.array([x[2] for x in lab], pa.bool_()),
        }
    )
    labels_path = os.path.join(out_dir, "labels.parquet")
    pq.write_table(labels, labels_path)

    truth = pa.table(
        {
            "url": pa.array(all_urls, pa.string()),
            "true_cluster": pa.array(
                [cluster_of[u] for u in all_urls], pa.int64()
            ),
        }
    )
    truth_path = os.path.join(out_dir, "truth.parquet")
    pq.write_table(truth, truth_path)
    return {"pages": pages_path, "labels": labels_path, "truth": truth_path}
