"""Deterministic synthetic webtext corpus + ground truth (FIXTURES.md §1-2).

Generates the authoritative input shape (BASELINE.json ``input_hint``):
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``
with planted duplicate structure:

- ~10% exact duplicates (byte-identical ``text``, group sizes 2-50 long tail)
  — the analogue of the reference's identical-subtree sharing
  (/root/reference/README.md:114-132).
- ~15% near duplicates: token mutations of a source doc targeting 5-shingle
  Jaccard ∈ {0.7, 0.8, 0.9, 0.95}; realized Jaccard recorded in truth_pairs.
- ~20% boilerplate-heavy rows sharing one large header/footer block with a
  small unique body — provokes LSH mega-buckets (skew case).
- ~5% rows embedding a verbatim ≥256-byte span from another doc (stage 3).
- unicode + 100-digit decimal + 1e±200 scientific content; a few degenerate
  rows (text="", text=null html-only, single token).

Everything is a pure function of (n, seed): same corpus on every node and
every run. No external data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION = 2  # v2: webtext sharded into 32 part files (read parallelism)
_EPOCH_US = 1735689600_000_000  # 2025-01-01T00:00:00Z in µs

_EN_STOP = (
    "the of and a to in is was for on that with as it by at from this be "
    "are or an were which you not have has had but all their one more"
).split()
_DE_STOP = "der die das und ist von mit für auf ein eine nicht als auch".split()
_FR_STOP = "le la les et de un une est pour dans que qui sur avec pas".split()

_UNICODE_TOKENS = ["héllo", "wörld", "ünïcôdé", "日本語", "статья", "✓", "π≈3"]
_NUMERIC_TOKENS = [
    "3." + "14159265358979323846264338327950288419716939937510582097494459230781640628620899862803482534211706" ,
    "2." + "71828182845904523536028747135266249775724709369995957496696762772407663035354759457138217852516642",
    "1e+200",
    "1e-200",
    "-9" * 25,
]


def _vocab(lang: str) -> list[str]:
    stop = {"en": _EN_STOP, "de": _DE_STOP, "fr": _FR_STOP}.get(lang, _EN_STOP)
    return stop + [f"{lang}w{i}" for i in range(4000)]


def shingle_set(text: str, k: int = 5) -> set[str]:
    """Word k-shingles over lowercased alnum tokens (the oracle's metric)."""
    import re

    toks = re.findall(r"[^\W_]+", text.lower(), flags=re.UNICODE)
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter) if (a or b) else 0.0


def _doc_tokens(rng: np.random.Generator, vocab: list[str], n_tok: int) -> list[str]:
    idx = rng.integers(0, len(vocab), size=n_tok)
    return [vocab[i] for i in idx]


def _mutate(rng: np.random.Generator, toks: list[str], vocab: list[str], target_j: float, k: int = 5) -> list[str]:
    """Replace tokens at the rate that lands ~target 5-shingle Jaccard."""
    p5 = 2 * target_j / (1 + target_j)          # shingle-survival prob
    r = 1.0 - p5 ** (1.0 / k)                    # per-token replacement rate
    out = list(toks)
    n_mut = max(1, int(round(r * len(toks))))
    pos = rng.choice(len(toks), size=min(n_mut, len(toks)), replace=False)
    for p in pos:
        out[p] = vocab[int(rng.integers(0, len(vocab)))]
    return out


def generate_webtext(n: int, seed: int = 42):
    """Build the corpus. Returns (webtext, truth_exact, truth_pairs,
    truth_spans) as pyarrow Tables."""
    rng = np.random.default_rng(seed)
    langs = ["en", "de", "fr"]
    lang_p = [0.9, 0.05, 0.05]                   # FIXTURES: ~90% one value
    vocabs = {l: _vocab(l) for l in langs}

    n_exact_extra = max(2, int(n * 0.10))
    n_near = max(4, int(n * 0.15))
    n_boiler = max(4, int(n * 0.20))
    n_substr = max(2, int(n * 0.05))
    n_degen = min(6, max(3, n // 300))
    n_base = n - n_exact_extra - n_near - n_boiler - n_substr - n_degen
    assert n_base > 10, f"corpus too small: {n}"

    texts: list[str | None] = []
    htmls: list[bytes | None] = []
    doc_lang: list[str] = []
    kinds: list[str] = []
    src_of: list[int] = []                       # planted source row idx (-1)

    def add(text, lang, kind, src=-1, html=None):
        texts.append(text)
        htmls.append(html)
        doc_lang.append(lang)
        kinds.append(kind)
        src_of.append(src)
        return len(texts) - 1

    base_rows: list[int] = []
    for i in range(n_base):
        lang = langs[int(rng.choice(3, p=lang_p))]
        n_tok = int(rng.integers(50, 400))
        toks = _doc_tokens(rng, vocabs[lang], n_tok)
        if i % 37 == 0:
            toks[: len(_UNICODE_TOKENS)] = _UNICODE_TOKENS
        if i % 53 == 0:
            toks[-len(_NUMERIC_TOKENS):] = _NUMERIC_TOKENS
        base_rows.append(add(" ".join(toks), lang, "base"))

    # snapshot as ndarray ONCE: Generator.choice(list) re-converts the whole
    # list per call (np.asarray), turning the planted-dup loops quadratic —
    # 800k-doc generation measured >60 min before, minutes after. asarray of
    # the same ints yields the same int64 array, so every draw is identical.
    base_arr = np.asarray(base_rows, dtype=np.int64)

    # exact duplicate groups, sizes 2..50 with a long tail
    exact_pairs: list[tuple[int, int]] = []
    remaining = n_exact_extra
    while remaining > 0:
        size_extra = int(min(1 + rng.pareto(1.3), 49, remaining))
        src = int(rng.choice(base_arr))
        for _ in range(size_extra):
            dup = add(texts[src], doc_lang[src], "exact", src=src)
            exact_pairs.append((src, dup))
        remaining -= size_extra

    # near duplicates at controlled Jaccard
    near_rows: list[tuple[int, int, float]] = []  # (src, dup, realized J)
    j_targets = [0.7, 0.8, 0.9, 0.95]
    for i in range(n_near):
        src = int(rng.choice(base_arr))
        tj = j_targets[i % 4]
        toks = texts[src].split(" ")
        mut = _mutate(rng, toks, vocabs[doc_lang[src]], tj)
        dup = add(" ".join(mut), doc_lang[src], "near", src=src)
        near_rows.append((src, dup, -1.0))        # realized J filled below

    # boilerplate: one big shared header/footer + small unique body
    header = _doc_tokens(np.random.default_rng(seed + 1), vocabs["en"], 90)
    footer = _doc_tokens(np.random.default_rng(seed + 2), vocabs["en"], 60)
    boiler_rows: list[int] = []
    for i in range(n_boiler):
        body = _doc_tokens(rng, vocabs["en"], int(rng.integers(8, 20)))
        toks = header + body + footer
        boiler_rows.append(add(" ".join(toks), "en", "boiler"))

    # shared substrings: verbatim >=256-byte char span from another doc
    span_rows: list[tuple[int, int, int, int]] = []  # (row, start, end, src)
    for i in range(n_substr):
        src = int(rng.choice(base_arr))
        stoks = texts[src].split(" ")
        # take a token span of >= 256 chars
        s0 = int(rng.integers(0, max(1, len(stoks) - 60)))
        span_toks, j = [], s0
        while j < len(stoks) and len(" ".join(span_toks)) < 256:
            span_toks.append(stoks[j])
            j += 1
        if len(" ".join(span_toks)) < 256:
            span_toks = stoks[:]                   # short doc: take it all
        lang = langs[int(rng.choice(3, p=lang_p))]
        pre = _doc_tokens(rng, vocabs[lang], int(rng.integers(40, 120)))
        post = _doc_tokens(rng, vocabs[lang], int(rng.integers(40, 120)))
        toks = pre + span_toks + post
        text = " ".join(toks)
        start = len(" ".join(pre)) + 1            # char offset of span start
        end = start + len(" ".join(span_toks))
        row = add(text, lang, "substr", src=src)
        span_rows.append((row, start, end, src))

    # degenerate rows
    add("", "en", "degen")
    add(None, "en", "degen", html=b"<html><head><title>t</title></head>"
        b"<body><p>only html body here</p></body></html>")
    add("solo", "en", "degen")
    for _ in range(n_degen - 3):
        add(None, "en", "degen", html=b"<div>x" + bytes(f"{rng.integers(0, 1 << 30)}", "ascii") + b"</div>")

    n_rows = len(texts)
    # urls + timestamps: deterministic, unique; shuffle row order so planted
    # structure is not position-correlated (blocks see a mix)
    perm = rng.permutation(n_rows)
    inv = np.empty(n_rows, dtype=np.int64)
    inv[perm] = np.arange(n_rows)

    urls = [f"https://site{(7 * i) % 1000}.example.com/p/{i:08d}" for i in range(n_rows)]
    ts = _EPOCH_US + rng.integers(0, 365 * 86400, size=n_rows) * 1_000_000

    def rowmap(i):                                 # original idx -> output idx
        return int(inv[i])

    out_url = [urls[rowmap(i)] for i in range(n_rows)]  # url keyed by orig idx

    webtext = pa.table(
        {
            "url": pa.array([out_url[i] for i in perm], type=pa.string()),
            "warc_ts": pa.array([int(ts[i]) for i in perm], type=pa.timestamp("us")),
            "html": pa.array([htmls[i] for i in perm], type=pa.binary()),
            "text": pa.array([texts[i] for i in perm], type=pa.string()),
            "lang": pa.array([doc_lang[i] for i in perm], type=pa.string()),
        }
    )

    # ---- truth tables (keyed by url) ----
    # exact groups: group id = min original row idx of the identical-text set
    text_to_rows: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        if t:
            text_to_rows.setdefault(t, []).append(i)
    te_url, te_grp = [], []
    for t, rows in text_to_rows.items():
        if len(rows) > 1:
            g = min(rows)
            for r in rows:
                te_url.append(out_url[r])
                te_grp.append(g)
    truth_exact = pa.table({"url": pa.array(te_url), "fp_group": pa.array(te_grp, type=pa.int64())})

    tp_src, tp_dst, tp_j = [], [], []
    for src, dup, _ in near_rows:
        j = jaccard(shingle_set(texts[src]), shingle_set(texts[dup]))
        tp_src.append(out_url[src]); tp_dst.append(out_url[dup]); tp_j.append(j)
    for src, dup in exact_pairs:
        tp_src.append(out_url[src]); tp_dst.append(out_url[dup]); tp_j.append(1.0)
    truth_pairs = pa.table(
        {"src_url": pa.array(tp_src), "dst_url": pa.array(tp_dst),
         "jaccard": pa.array(tp_j, type=pa.float64())}
    )

    ts_url, ts_s, ts_e, ts_srcu = [], [], [], []
    for row, s, e, src in span_rows:
        ts_url.append(out_url[row]); ts_s.append(s); ts_e.append(e)
        ts_srcu.append(out_url[src])
    truth_spans = pa.table(
        {"url": pa.array(ts_url), "start": pa.array(ts_s, type=pa.int64()),
         "end": pa.array(ts_e, type=pa.int64()), "source_url": pa.array(ts_srcu)}
    )
    return webtext, truth_exact, truth_pairs, truth_spans


def materialize_corpus(n: int, seed: int = 42, root: str = "/tmp/sick_ray_synth") -> str:
    """Write (or reuse) the corpus as parquet under a deterministic dir.

    Returns the directory containing webtext.parquet + truth_*.parquet.
    Cached by (n, seed, GEN_VERSION) so bench/tests never regenerate.
    """
    d = os.path.join(root, f"v{GEN_VERSION}_n{n}_s{seed}")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    tmp = d + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    web, te, tp, tsp = generate_webtext(n, seed)
    # shard the corpus: one file reads as ONE Ray task regardless of row
    # groups, serializing the whole ingest (and a real 100 TB corpus is
    # always many objects — "never one giant file")
    shard_dir = os.path.join(tmp, "webtext.parquet")
    os.makedirs(shard_dir, exist_ok=True)
    n_shards = min(32, max(1, web.num_rows // 512))
    per = -(-web.num_rows // n_shards)
    for i in range(n_shards):
        pq.write_table(
            web.slice(i * per, per),
            os.path.join(shard_dir, f"part-{i:05d}.parquet"),
            row_group_size=4096,
        )
    pq.write_table(te, os.path.join(tmp, "truth_exact.parquet"))
    pq.write_table(tp, os.path.join(tmp, "truth_pairs.parquet"))
    pq.write_table(tsp, os.path.join(tmp, "truth_spans.parquet"))
    os.makedirs(d, exist_ok=True)
    for f in os.listdir(tmp):
        os.replace(os.path.join(tmp, f), os.path.join(d, f))
    os.rmdir(tmp)
    with open(done, "w") as fh:
        fh.write("ok")
    return d
