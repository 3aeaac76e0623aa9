"""Regenerate airflow_etl_spark/_expected.py — independent expected
outputs for the two registry queries whose algorithms SQL cannot express
(`bpe_token_stats`: iterative merge learning; `corpus_pack_ffd`: greedy
first-fit-decreasing loop).

The expected relations are computed here in PURE PYTHON — independent
reimplementations of the algorithms (same as the references in
tests/test_bpe.py / tests/test_corpus.py), NOT by running the Spark
operators — so the embedded oracles genuinely cross-check the engine.
Each relation is keyed by a fingerprint of the `documents` table
(md5 over ordered doc_id:n_chars), computed with the exact SQL expression
the oracle uses, so one oracle string serves every scale factor whose
expected output is embedded (sf0.001 for the local suite, sf0.01 for the
driver's gate).

Run:  python scripts/gen_expected.py
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import duckdb

SFS = ["0.001", "0.01"]
OUT = "airflow_etl_spark/_expected.py"

FINGERPRINT_SQL = (
    "SELECT md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || "
    "CAST(n_chars AS VARCHAR), ',' ORDER BY doc_id)) FROM documents"
)

# ----------------------------------------------------------- BPE (pure py)
EOW = "</w>"


def _norm_words(text: str) -> list[str]:
    """operators.text.ws_tokens semantics: lowercase, collapse whitespace
    runs, trim, split on single space, drop empties. The corpus is ASCII
    (synthetic), so Python/Java regex \\s dialects agree."""
    t = re.sub(r"\s+", " ", (text or "").lower()).strip()
    return [w for w in t.split(" ") if w]


def _merge_pass(syms: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    vocab = {w: list(w) + [EOW] for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (left, right), n = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if n <= 1:
            break
        merges.append((left, right))
        vocab = {w: _merge_pass(s, left, right) for w, s in vocab.items()}
    return merges, vocab


def _merge_pass_batch(syms: list[str], pairs: set[tuple[str, str]]) -> list[str]:
    """Combined left-to-right pass over a SET of merges — the batched
    rule operators/bpe._apply_merge_batch implements: merge whenever
    (accumulator tail, next symbol) is in the set; a symbol produced
    earlier in the pass may cascade into a later match."""
    out: list[str] = []
    for x in syms:
        if out and (out[-1], x) in pairs:
            out[-1] = out[-1] + x
        else:
            out.append(x)
    return out


def _select_disjoint(ranked, batch):
    """operators/bpe.select_disjoint_pairs, verbatim rule."""
    used: set[str] = set()
    picked: list[tuple[str, str]] = []
    for left, right, n in ranked:
        if n <= 1 or len(picked) >= batch:
            break
        if left in used or right in used:
            continue
        picked.append((left, right))
        used.add(left)
        used.add(right)
    return picked


def _py_bpe_batched(
    word_counts: dict[str, int], n_merges: int, batch: int,
    window_mult: int = 8,
):
    """Batched BPE: per round rank pairs (count desc, l, r), truncate to
    the window_mult*take candidate window, take up to `batch`
    symbol-disjoint pairs, apply them in ONE combined pass. The exact
    rule of operators/bpe.bpe_train(batch>1)."""
    vocab = {w: list(w) + [EOW] for w in word_counts}
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        take = min(batch, n_merges - len(merges))
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        ranked = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[: max(1, window_mult * take)]
        picked = _select_disjoint(
            [(l, r, n) for (l, r), n in ranked], take
        )
        if not picked:
            break
        merges.extend(picked)
        pset = set(picked)
        vocab = {w: _merge_pass_batch(s, pset) for w, s in vocab.items()}
    return merges, vocab


def _py_bpe_sampled(
    word_counts: dict[str, int], n_merges: int, batch: int,
    sample_fraction: float, salt: str = "bpe-sample-v1",
    window_mult: int = 8,
):
    """SAMPLED batched BPE — operators/bpe.bpe_train(sample_fraction=f)
    verbatim: train per-round disjoint batches on the deterministic
    hash-sample of the word relation (h28(salt:word) % 1000 <
    round(f*1000)), then apply the rounds IN ORDER to the full
    vocabulary (the encode stays exact/full-corpus)."""
    keep = int(round(sample_fraction * 1000))
    sampled = {
        w: c for w, c in word_counts.items()
        if _h28(f"{salt}:{w}") % 1000 < keep
    }
    vocab_s = {w: list(w) + [EOW] for w in sampled}
    merges: list[tuple[str, str]] = []
    rounds: list[list[tuple[str, str]]] = []
    while len(merges) < n_merges:
        take = min(batch, n_merges - len(merges))
        pairs: Counter = Counter()
        for w, syms in vocab_s.items():
            c = sampled[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        ranked = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[: max(1, window_mult * take)]
        picked = _select_disjoint(
            [(l, r, n) for (l, r), n in ranked], take
        )
        if not picked:
            break
        merges.extend(picked)
        rounds.append(picked)
        pset = set(picked)
        vocab_s = {w: _merge_pass_batch(s, pset) for w, s in vocab_s.items()}
    vocab = {w: list(w) + [EOW] for w in word_counts}
    for picked in rounds:
        pset = set(picked)
        vocab = {w: _merge_pass_batch(s, pset) for w, s in vocab.items()}
    return merges, vocab


def bpe_token_stats_expected(docs: list[tuple[int, str]]) -> list[tuple]:
    """(doc_id, n_words, n_bpe_tokens) per doc — 8-merge BPE trained on
    the corpus word counts, then per-doc token totals."""
    per_doc = {doc_id: _norm_words(text) for doc_id, text in docs}
    wc = Counter(w for ws in per_doc.values() for w in ws)
    _merges, vocab = _py_bpe(dict(wc), 8)
    rows = []
    for doc_id in sorted(per_doc):
        ws = per_doc[doc_id]
        if not ws:
            continue  # bpe_encode's posexplode emits nothing for empty text
        rows.append((doc_id, len(ws), sum(len(vocab[w]) for w in ws)))
    return rows


def bpe_batched_stats_expected(docs: list[tuple[int, str]]) -> list[tuple]:
    """(doc_id, n_words, n_bpe_tokens) per doc under BATCHED training:
    64 merges taken 16 per round — the job-wave-collapsed variant a
    production vocab size requires (operators/bpe.bpe_train batch>1)."""
    per_doc = {doc_id: _norm_words(text) for doc_id, text in docs}
    wc = Counter(w for ws in per_doc.values() for w in ws)
    _merges, vocab = _py_bpe_batched(dict(wc), n_merges=64, batch=16)
    rows = []
    for doc_id in sorted(per_doc):
        ws = per_doc[doc_id]
        if not ws:
            continue
        rows.append((doc_id, len(ws), sum(len(vocab[w]) for w in ws)))
    return rows


def bpe_sampled_stats_expected(docs: list[tuple[int, str]]) -> list[tuple]:
    """(doc_id, n_words, n_bpe_tokens) per doc under SAMPLED training:
    64 merges taken 16 per round, learned on the deterministic
    half-vocabulary hash-sample, encoding the full corpus
    (operators/bpe.bpe_train sample_fraction=0.5)."""
    per_doc = {doc_id: _norm_words(text) for doc_id, text in docs}
    wc = Counter(w for ws in per_doc.values() for w in ws)
    _merges, vocab = _py_bpe_sampled(
        dict(wc), n_merges=64, batch=16, sample_fraction=0.5
    )
    rows = []
    for doc_id in sorted(per_doc):
        ws = per_doc[doc_id]
        if not ws:
            continue
        rows.append((doc_id, len(ws), sum(len(vocab[w]) for w in ws)))
    return rows


# ----------------------------------------------------------- FFD (pure py)
def _h28(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def pack_ffd_expected(
    sizes: list[tuple[int, int]], budget: int = 4096, n_shards: int = 8
) -> list[tuple]:
    """(doc_id, shard, bin_id, n_tokens, bin_fill) — per-shard
    first-fit-decreasing, (tokens desc, id asc) order, salted shard hash —
    operators.corpus.pack_sequences_ffd semantics."""
    shards: dict[int, list[tuple[int, int]]] = {}
    for doc_id, n in sizes:
        shards.setdefault(_h28(f"pack-v1:{doc_id}") % n_shards, []).append(
            (doc_id, n)
        )
    rows = []
    for s, members in shards.items():
        members.sort(key=lambda t: (-t[1], t[0]))
        bins: list[int] = []
        assign: list[tuple[int, int, int]] = []
        for doc_id, tok in members:
            placed = None
            for b, used in enumerate(bins):
                if used + tok <= budget:
                    placed = b
                    bins[b] = used + tok
                    break
            if placed is None:
                placed = len(bins)
                bins.append(tok)
            assign.append((doc_id, tok, placed))
        for doc_id, tok, b in assign:
            rows.append((doc_id, s, b, tok, bins[b]))
    return sorted(rows)


# ----------------------------------------------------------------- emit --
def main() -> None:
    bpe_by_fp: dict[str, list[tuple]] = {}
    bpeb_by_fp: dict[str, list[tuple]] = {}
    bpes_by_fp: dict[str, list[tuple]] = {}
    ffd_by_fp: dict[str, list[tuple]] = {}
    for sf in SFS:
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'/root/testdata/sf{sf}/documents.parquet'"
        )
        fp = con.execute(FINGERPRINT_SQL).fetchone()[0]
        docs = con.execute(
            "SELECT doc_id, text, n_chars FROM documents ORDER BY doc_id"
        ).fetchall()
        con.close()
        bpe_by_fp[fp] = bpe_token_stats_expected([(d, t) for d, t, _ in docs])
        bpeb_by_fp[fp] = bpe_batched_stats_expected([(d, t) for d, t, _ in docs])
        bpes_by_fp[fp] = bpe_sampled_stats_expected([(d, t) for d, t, _ in docs])
        ffd_by_fp[fp] = pack_ffd_expected([(d, int(n)) for d, _, n in docs])
        print(
            f"sf{sf}: fp={fp} bpe_rows={len(bpe_by_fp[fp])} "
            f"bpe_batched_rows={len(bpeb_by_fp[fp])} "
            f"bpe_sampled_rows={len(bpes_by_fp[fp])} ffd_rows={len(ffd_by_fp[fp])}"
        )

    with open(OUT, "w") as f:
        f.write(
            '"""Expected relations for the two non-SQL-expressible registry\n'
            "queries, keyed by a fingerprint of the documents table — GENERATED\n"
            "by scripts/gen_expected.py from independent pure-Python reference\n"
            "implementations (do not edit by hand; regenerate when testdata\n"
            'changes). See queries.py `_fingerprint_values_oracle`."""\n\n'
        )
        f.write(
            "#: md5(string_agg(doc_id:n_chars ORDER BY doc_id)) -> rows\n"
        )
        for name, data in (
            ("BPE_TOKEN_STATS", bpe_by_fp),
            ("BPE_BATCHED_STATS", bpeb_by_fp),
            ("BPE_SAMPLED_STATS", bpes_by_fp),
            ("PACK_FFD", ffd_by_fp),
        ):
            f.write(f"{name} = {{\n")
            for fp, rows in data.items():
                f.write(f"    {fp!r}: [\n")
                for r in rows:
                    f.write(f"        {r!r},\n")
                f.write("    ],\n")
            f.write("}\n\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
