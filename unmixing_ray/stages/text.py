"""Text-analysis operators over the documents table (training-data
pipeline ops; engine-new, graded alongside SURVEY.md §2).

All operators are vectorized ``map_batches`` stages; aggregates return
integer-valued columns wherever possible so the DuckDB oracle comparison
is hash-exact (floats only where the semantics require them).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ray.data.aggregate import Count, Max, Min, Sum

EN_STOPWORDS = ("the", "and", "of", "to", "a", "in")
PUNCT = ".,!?;:"


def token_count(docs):
    """doc_id, n_tokens (space-delimited, empties dropped).

    Arrow-native: a non-empty token is a maximal run of non-space
    chars, so the count is one ``count_substring_regex`` kernel over
    the zero-copy batch — no pandas conversion, no per-row Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.cast(t["text"], pa.string()), "[^ ]+")
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pc.cast(n, pa.int64())})

    return docs.map_batches(fn, batch_format="pyarrow")


def token_count_sql():
    return ("SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS BIGINT) AS n_tokens FROM documents")


def lang_stats(docs):
    """Per-language doc count and exact n_chars sum/min/max (ints)."""
    return docs.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
    )


def lang_stats_sql():
    return ("SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(min(n_chars) AS BIGINT) AS min_chars, "
            "CAST(max(n_chars) AS BIGINT) AS max_chars "
            "FROM documents GROUP BY lang")


def quality_score(docs):
    """Per-doc quality features: token count, punctuation count, stopword
    count, micro-scaled mean token length (integer for hash-exactness)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ").map(
            lambda ts: [t for t in ts if t])
        n_tokens = toks.map(len).astype("int64")
        n_punct = df["text"].map(
            lambda s: sum(s.count(c) for c in PUNCT)).astype("int64")
        n_stop = toks.map(
            lambda ts: sum(1 for t in ts if t.lower() in EN_STOPWORDS))\
            .astype("int64")
        tok_chars = toks.map(lambda ts: sum(len(t) for t in ts))\
            .astype("int64")
        mean_tok_len_u6 = np.where(
            n_tokens > 0,
            np.floor(tok_chars.to_numpy() * 1_000_000
                     / np.maximum(n_tokens.to_numpy(), 1)),
            0).astype("int64")
        return pd.DataFrame({
            "doc_id": df["doc_id"], "n_tokens": n_tokens,
            "n_punct": n_punct, "n_stopwords": n_stop,
            "mean_tok_len_u6": mean_tok_len_u6,
        })

    return docs.map_batches(fn, batch_format="pandas")


def quality_score_sql():
    stop = ", ".join("'%s'" % s for s in EN_STOPWORDS)
    return f"""
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(length(text) - length(translate(text, '.,!?;:', ''))
                    AS BIGINT) AS n_punct,
               CAST(len(list_filter(toks, x -> lower(x) IN ({stop})))
                    AS BIGINT) AS n_stopwords,
               CAST(CASE WHEN len(toks) > 0 THEN floor(
                    list_sum(list_transform(toks, x -> length(x)))
                    * 1000000.0 / len(toks)) ELSE 0 END AS BIGINT)
                 AS mean_tok_len_u6
        FROM t"""


def lang_id(docs, min_stopwords=2):
    """Heuristic language ID: 'en' iff >= min_stopwords English stopword
    tokens, else 'other'. Returns doc_id, lang_pred."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.split(" ")
        n_stop = toks.map(
            lambda ts: sum(1 for t in ts if t in EN_STOPWORDS))
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "lang_pred": np.where(n_stop >= min_stopwords, "en", "other"),
        })

    return docs.map_batches(fn, batch_format="pandas")


def lang_id_sql(min_stopwords=2):
    stop = ", ".join("'%s'" % s for s in EN_STOPWORDS)
    return (f"SELECT doc_id, CASE WHEN len(list_filter("
            f"string_split(lower(text), ' '), x -> x IN ({stop}))) >= "
            f"{min_stopwords} THEN 'en' ELSE 'other' END AS lang_pred "
            f"FROM documents")


def fingerprint(docs, ngram=16):
    """Document fingerprint: lexicographic min of md5 hex digests over all
    character ``ngram``-grams (a 1-perm MinHash). Short docs (< ngram
    chars) hash the whole text."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        fps = []
        for s in df["text"]:
            if len(s) < ngram:
                fps.append(hashlib.md5(s.encode()).hexdigest())
                continue
            best = None
            for i in range(len(s) - ngram + 1):
                h = hashlib.md5(s[i:i + ngram].encode()).hexdigest()
                if best is None or h < best:
                    best = h
            fps.append(best)
        return pd.DataFrame({"doc_id": df["doc_id"], "fp": fps})

    return docs.map_batches(fn, batch_format="pandas")


def fingerprint_sql(ngram=16):
    # scalar range() + unnest (the table-function form cannot lateral-join
    # on d.text); short docs reduce to md5(text) because range(1,2)=[1]
    # and substring(text,1,ngram)=text
    return f"""
        WITH s AS (
          SELECT doc_id,
                 unnest(range(1, greatest(length(text) - {ngram} + 2, 2)))
                   AS i,
                 text
          FROM documents)
        SELECT doc_id,
               min(md5(substring(text, CAST(i AS INT), {ngram}))) AS fp
        FROM s GROUP BY doc_id"""


def bigram_topk(docs, k=20):
    """Global top-k word bigrams over the corpus (tokens: maximal
    [a-z0-9]+ runs of the lowercased text — the n-gram statistics
    primitive of a training-data pipeline). Combiner-before-shuffle: each
    batch pre-aggregates its bigram counts, so the single ``groupby``
    shuffle carries one row per (batch, distinct bigram), never a row
    per token; the global top-k is a sort+limit over the merged counts
    with a deterministic (count desc, bigram asc) tiebreak."""
    import re
    tok = re.compile(r"[a-z0-9]+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c = Counter()
        for s in df["text"]:
            ts = tok.findall(s.lower())
            c.update(ts[i] + " " + ts[i + 1] for i in range(len(ts) - 1))
        return pd.DataFrame({"bigram": list(c.keys()),
                             "n": np.fromiter(c.values(), np.int64,
                                              len(c))})

    return docs.map_batches(partial, batch_format="pandas")\
        .groupby("bigram").aggregate(Sum("n", alias_name="n_total"))\
        .sort(["n_total", "bigram"], descending=[True, False])\
        .limit(k)


def bigram_topk_sql(k=20):
    return f"""
        WITH toks AS (
          SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        pairs AS (
          SELECT t[i] || ' ' || t[i+1] AS bigram
          FROM (SELECT t, unnest(generate_series(1, len(t)-1)) AS i
                FROM toks))
        SELECT bigram, CAST(count(*) AS BIGINT) AS n_total
        FROM pairs GROUP BY bigram
        ORDER BY n_total DESC, bigram LIMIT {k}"""


def tfidf_topk(docs, k=3, idf_scale=1_000_000):
    """Top-``k`` TF-IDF terms per document (tokens: maximal [a-z0-9]+
    runs of the lowercased text, like :func:`bigram_topk`). The score is
    the integer-exact variant ``tf * ((N * idf_scale) // df)`` — a
    monotone transform of tf·(N/df) per fixed df that both the engine
    and the SQL oracle compute in int64 with identical results (float
    ln() differs in the last ulp between libm implementations).

    Scale shape: NO broadcast vocabulary. Pass 1 explodes docs to
    per-doc distinct (doc_id, token, tf) pairs (the inverted-index
    explosion, unavoidable for document frequency); one groupby(token)
    attaches df = group size and scores; one groupby(doc_id) keeps the
    top k. Both shuffles carry only the pair rows, never the text.
    """
    import re
    from collections import Counter
    tok = re.compile(r"[a-z0-9]+")
    n_docs = docs.count()
    idf_num = int(n_docs) * int(idf_scale)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d_ids, toks, tfs = [], [], []
        for doc_id, s in zip(df["doc_id"], df["text"]):
            c = Counter(tok.findall(s.lower()))
            d_ids.extend([doc_id] * len(c))
            toks.extend(c.keys())
            tfs.extend(c.values())
        return pd.DataFrame({
            "doc_id": pd.Series(d_ids, dtype="int64"),
            "token": pd.Series(toks, dtype="string"),
            "tf": pd.Series(tfs, dtype="int64")})

    def score(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score_u"] = g["tf"].to_numpy() * np.int64(idf_num // len(g))
        return g

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score_u", "token"],
                          ascending=[False, True]).head(k).copy()
        g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["doc_id", "token", "tf", "score_u", "rk"]]

    p = docs.select_columns(["doc_id", "text"]).map_batches(
        pairs, batch_format="pandas")
    scored = p.groupby("token").map_groups(score, batch_format="pandas")
    return scored.groupby("doc_id").map_groups(topk,
                                               batch_format="pandas")


def tfidf_topk_sql(k=3, idf_scale=1_000_000):
    return f"""
        WITH pairs AS (
          SELECT doc_id, t AS token, count(*) AS tf
          FROM (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS t
                FROM documents)
          GROUP BY doc_id, t),
        dfreq AS (SELECT token, count(*) AS df FROM pairs GROUP BY token),
        nn AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT p.doc_id, p.token, p.tf,
                 p.tf * ((nn.n * {int(idf_scale)}) // d.df) AS score_u
          FROM pairs p JOIN dfreq d USING (token) CROSS JOIN nn),
        ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY score_u DESC, token) AS rk
          FROM scored)
        SELECT CAST(doc_id AS BIGINT) AS doc_id, token,
               CAST(tf AS BIGINT) AS tf,
               CAST(score_u AS BIGINT) AS score_u,
               CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= {int(k)}"""


def gate_features(txt, min_stopwords=2, min_tokens=20,
                  min_mtl_u6=4_000_000, max_mtl_u6=4_700_000):
    """Vectorized C4-style gate features over a pyarrow string array
    (shared by :func:`corpus_filter` and the end-to-end curation
    pipeline). Returns numpy ``(keep, n_tokens, mean_tok_len_u6)``.

    All three features are Arrow kernels over the zero-copy batch (no
    per-row Python): token count = runs of non-space chars; token chars
    = total length minus space count (single-space split means every
    non-space char belongs to exactly one token); stopword count =
    case-insensitive full-token alternation. RE2 has no lookahead, so
    boundary spaces are made non-shareable by doubling every space and
    padding the ends — each token then owns its own " token " window
    and non-overlapping counting is exact even for adjacent stopwords.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    stop_re = "(?i) (?:%s) " % "|".join(sorted(EN_STOPWORDS))
    n_tokens = pc.cast(
        pc.count_substring_regex(txt, "[^ ]+"), pa.int64())\
        .to_numpy(zero_copy_only=False)
    spaced = pc.binary_join_element_wise(
        " ", pc.replace_substring(txt, " ", "  "), " ", "")
    n_stop = pc.cast(pc.count_substring_regex(spaced, stop_re),
                     pa.int64()).to_numpy(zero_copy_only=False)
    tok_chars = (pc.cast(pc.utf8_length(txt), pa.int64())
                 .to_numpy(zero_copy_only=False)
                 - pc.cast(pc.count_substring(txt, " "), pa.int64())
                 .to_numpy(zero_copy_only=False))
    mtl_u6 = np.where(
        n_tokens > 0,
        np.floor(tok_chars * 1_000_000 / np.maximum(n_tokens, 1)),
        0).astype("int64")
    keep = ((n_stop >= min_stopwords) & (n_tokens >= min_tokens)
            & (mtl_u6 >= min_mtl_u6) & (mtl_u6 <= max_mtl_u6))
    return keep, n_tokens, mtl_u6


def corpus_filter(docs, min_stopwords=2, min_tokens=20,
                  min_mtl_u6=4_000_000, max_mtl_u6=4_700_000):
    """C4-style corpus cleanup pipeline: language gate (>= min_stopwords
    English stopword tokens), length gate (>= min_tokens tokens),
    lexical-plausibility gate (micro-scaled mean token length within
    [min_mtl_u6, max_mtl_u6]), then exact-dup removal (md5(text),
    keep the minimum doc_id per hash).

    One vectorized feature+filter ``map_batches`` pass over the corpus
    (all gates evaluated per batch — no shuffle), then the surviving
    rows shuffle ONCE by content hash for the keep-first dedup. At
    100 TB the shuffle moves only (hash, doc_id, n_tokens,
    mean_tok_len_u6) for the docs that pass the gates — the text never
    enters the exchange. Returns (doc_id, n_tokens, mean_tok_len_u6).
    """

    def gate(t):
        import pyarrow as pa
        import pyarrow.compute as pc
        txt = pc.cast(t["text"], pa.string())
        keep, n_tokens, mtl_u6 = gate_features(
            txt, min_stopwords, min_tokens, min_mtl_u6, max_mtl_u6)
        kept_idx = np.flatnonzero(keep)
        sel = txt.take(pa.array(kept_idx))
        h = [hashlib.md5(s.encode()).hexdigest()
             for s in sel.to_pylist()]
        return pa.table({
            "h": pa.array(h, pa.string()),
            "doc_id": pc.cast(t["doc_id"], pa.int64())
            .take(pa.array(kept_idx)),
            "n_tokens": pa.array(n_tokens[keep], pa.int64()),
            "mean_tok_len_u6": pa.array(mtl_u6[keep], pa.int64())})

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, "doc_id")[
            ["doc_id", "n_tokens", "mean_tok_len_u6"]]

    return docs.map_batches(gate, batch_format="pyarrow") \
        .groupby("h").map_groups(keep_first, batch_format="pandas")


def corpus_filter_sql(min_stopwords=2, min_tokens=20,
                      min_mtl_u6=4_000_000, max_mtl_u6=4_700_000):
    stop = ", ".join("'%s'" % s for s in EN_STOPWORDS)
    return f"""
        WITH t AS (
          SELECT doc_id, md5(text) AS h,
                 list_filter(string_split(text, ' '), x -> x <> '')
                   AS toks,
                 len(list_filter(string_split(lower(text), ' '),
                     x -> x IN ({stop}))) AS n_stop
          FROM documents),
        f AS (
          SELECT doc_id, h,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(CASE WHEN len(toks) > 0 THEN floor(
                      list_sum(list_transform(toks, x -> length(x)))
                      * 1000000.0 / len(toks)) ELSE 0 END AS BIGINT)
                   AS mean_tok_len_u6
          FROM t WHERE n_stop >= {min_stopwords})
        SELECT doc_id, n_tokens, mean_tok_len_u6
        FROM f
        WHERE n_tokens >= {min_tokens}
          AND mean_tok_len_u6 BETWEEN {min_mtl_u6} AND {max_mtl_u6}
        QUALIFY row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1"""


# ---------------------------------------------------------------------------
# PII scrubbing — a standard training-data hygiene pass: redact emails,
# phone numbers and IPv4 addresses, reporting per-document counts plus a
# fingerprint of the scrubbed text. One vectorized map_batches pass;
# regexes are compiled once per worker process at module import, and the
# patterns stay in RE2-compatible syntax so the DuckDB oracle applies
# the IDENTICAL expressions with regexp_replace(..., 'g').

import re as _re

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_PII = [("email", _re.compile(PII_EMAIL), "<EMAIL>"),
        ("ip", _re.compile(PII_IP), "<IP>"),
        ("phone", _re.compile(PII_PHONE), "<PHONE>")]


def pii_scrub(docs, text_col="text", fp_len=16):
    """Redact PII (emails, then IPv4s, then phones — fixed order so the
    oracle replays it) from ``text_col``. Output: doc_id, per-kind
    redaction counts, and ``fp`` = first ``fp_len`` hex chars of the md5
    of the scrubbed text (the value-hash proof that the rewritten TEXT
    matches, without shipping it)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].astype(str)
        out = {"doc_id": df["doc_id"].astype(np.int64)}
        for name, pat, token in _PII:
            out["n_" + name] = s.str.count(pat).astype(np.int64)
            s = s.str.replace(pat, token, regex=True)
        out["fp"] = [hashlib.md5(t.encode()).hexdigest()[:fp_len]
                     for t in s]
        return pd.DataFrame(out)

    return docs.map_batches(fn, batch_format="pandas")


def pii_scrub_sql(aug_text_expr="text", fp_len=16):
    """DuckDB oracle for :func:`pii_scrub` over ``documents`` —
    ``aug_text_expr`` lets callers plant PII inline (the provided corpus
    has none) as a pure SQL function of the row, matching the engine
    side's construction exactly."""
    return f"""
        WITH aug AS (SELECT doc_id, {aug_text_expr} AS t FROM documents),
        s1 AS (SELECT doc_id, t,
                      len(regexp_extract_all(t, '{PII_EMAIL}')) AS ne,
                      regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g')
                        AS t1
               FROM aug),
        s2 AS (SELECT doc_id, ne,
                      len(regexp_extract_all(t1, '{PII_IP}')) AS ni,
                      regexp_replace(t1, '{PII_IP}', '<IP>', 'g') AS t2
               FROM s1),
        s3 AS (SELECT doc_id, ne, ni,
                      len(regexp_extract_all(t2, '{PII_PHONE}')) AS np,
                      regexp_replace(t2, '{PII_PHONE}', '<PHONE>', 'g')
                        AS t3
               FROM s2)
        SELECT doc_id,
               CAST(ne AS BIGINT) AS n_email,
               CAST(ni AS BIGINT) AS n_ip,
               CAST(np AS BIGINT) AS n_phone,
               substr(md5(t3), 1, {fp_len}) AS fp
        FROM s3"""


# ---------------------------------------------------------------------------
# Gopher-style repetition signal: the fraction of duplicate word
# n-grams per document (Rae et al. 2021 use duplicate-line and
# duplicate-ngram fractions as quality gates). Integer-exact:
# dup_u6 = (n_grams - n_distinct) * 1e6 // n_grams, so the SQL oracle
# hash-matches bit for bit — no float division anywhere.

def gopher_repetition(docs, n=3):
    """Per-document duplicate word-``n``-gram fraction (tokens: maximal
    [a-z0-9]+ runs of the lowercased text, same tokenizer as
    :func:`bigram_topk`). Output: doc_id, n_grams, n_distinct, dup_u6.
    Documents shorter than ``n`` tokens report zero grams and dup_u6=0.
    One vectorized map_batches pass — per-doc work only, no shuffle."""
    tok = _re.compile(r"[a-z0-9]+")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids, tot, dis, dup = [], [], [], []
        for i, s in zip(df["doc_id"], df["text"]):
            ts = tok.findall(s.lower())
            grams = [" ".join(ts[j:j + n]) for j in range(len(ts) - n + 1)]
            t, d = len(grams), len(set(grams))
            ids.append(int(i))
            tot.append(t)
            dis.append(d)
            dup.append((t - d) * 1_000_000 // t if t else 0)
        return pd.DataFrame({
            "doc_id": np.array(ids, np.int64),
            "n_grams": np.array(tot, np.int64),
            "n_distinct": np.array(dis, np.int64),
            "dup_u6": np.array(dup, np.int64)})

    return docs.map_batches(fn, batch_format="pandas")



def gopher_repetition_sql(n=3):
    """DuckDB oracle for :func:`gopher_repetition`."""
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+')
            AS t
          FROM documents),
        grams AS (
          SELECT doc_id, {parts} AS g
          FROM (SELECT doc_id, t,
                       unnest(generate_series(1, len(t) - {n - 1})) AS i
                FROM toks)),
        agg AS (
          SELECT doc_id, count(*) AS t, count(DISTINCT g) AS d
          FROM grams GROUP BY doc_id)
        SELECT k.doc_id,
               CAST(coalesce(a.t, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(a.d, 0) AS BIGINT) AS n_distinct,
               CAST(coalesce((a.t - a.d) * 1000000 // a.t, 0) AS BIGINT)
                 AS dup_u6
        FROM (SELECT doc_id FROM documents) k
        LEFT JOIN agg a USING (doc_id)"""


# ---------------------------------------------------------------------------
# End-to-end training-data prep: one decision per document with the
# reason code — the composite pipeline a 100-TB corpus actually runs
# (gates, then dedup among the survivors), expressed as ONE feature
# pass + ONE narrow shuffle. Gate features reuse the exact semantics of
# corpus_filter (space-split tokens for length/lexical/stopword gates)
# and gopher_repetition ([a-z0-9]+ 3-grams for the repetition gate), so
# every branch is independently oracle-checked elsewhere too.

TEXTPREP_GATES = ("lang", "short", "lexical", "repetition")


def textprep_decisions(docs, min_stopwords=2, min_tokens=20,
                       min_mtl_u6=4_000_000, max_mtl_u6=4_700_000,
                       max_dup_u6=20_000, ngram=3):
    """Per-document verdicts: the FIRST failing gate of
    lang → short → lexical → repetition, else 'duplicate' (a
    gate-passing doc whose md5(text) has a smaller gate-passing
    doc_id) or 'keep'.

    Scale shape: one vectorized feature pass computes every gate AND
    the content hash per batch; the single shuffle then carries only
    (doc_id, n_tokens, verdict, h) — text never enters the exchange,
    and gate failures ride the same shuffle under a per-doc singleton
    key (no second pass over the corpus, no branch re-execution)."""
    tok = _re.compile(r"[a-z0-9]+")

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        ids, nt, verdicts, hs = [], [], [], []
        for i, s in zip(df["doc_id"], df["text"]):
            toks = [t for t in s.split(" ") if t]
            n_tokens = len(toks)
            n_stop = sum(1 for t in toks if t.lower() in EN_STOPWORDS)
            chars = sum(len(t) for t in toks)
            mtl = int(np.floor(chars * 1_000_000 / n_tokens)) \
                if n_tokens else 0
            rt = tok.findall(s.lower())
            grams = [" ".join(rt[j:j + ngram])
                     for j in range(len(rt) - ngram + 1)]
            t_, d_ = len(grams), len(set(grams))
            dup = (t_ - d_) * 1_000_000 // t_ if t_ else 0
            if n_stop < min_stopwords:
                v = "lang"
            elif n_tokens < min_tokens:
                v = "short"
            elif not (min_mtl_u6 <= mtl <= max_mtl_u6):
                v = "lexical"
            elif dup > max_dup_u6:
                v = "repetition"
            else:
                v = ""
            ids.append(int(i))
            nt.append(n_tokens)
            verdicts.append(v)
            # failures get a singleton shuffle key so they pass through
            # the same exchange without joining any dedup group
            hs.append(hashlib.md5(s.encode()).hexdigest() if v == ""
                      else "f%d" % int(i))
        return pd.DataFrame({
            "doc_id": np.array(ids, np.int64),
            "n_tokens": np.array(nt, np.int64),
            "verdict": verdicts, "h": hs})

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        out = g[["doc_id", "n_tokens", "verdict"]].copy()
        if (out["verdict"] == "").any():
            first = g["doc_id"].min()
            out["verdict"] = np.where(g["doc_id"] == first, "keep",
                                      "duplicate")
        return out

    return docs.map_batches(feats, batch_format="pandas")\
        .groupby("h").map_groups(decide, batch_format="pandas")


def textprep_decisions_sql(base_sql="SELECT doc_id, text FROM documents",
                           min_stopwords=2, min_tokens=20,
                           min_mtl_u6=4_000_000, max_mtl_u6=4_700_000,
                           max_dup_u6=20_000, ngram=3):
    """DuckDB oracle for :func:`textprep_decisions` over any base
    relation (``base_sql`` lets the query plant exact duplicates)."""
    stop = ", ".join("'%s'" % s for s in EN_STOPWORDS)
    parts = " || ' ' || ".join(f"rt[i+{j}]" for j in range(ngram))
    return f"""
        WITH base AS ({base_sql}),
        t AS (
          SELECT doc_id, md5(text) AS h,
                 list_filter(string_split(text, ' '), x -> x <> '')
                   AS toks,
                 len(list_filter(string_split(lower(text), ' '),
                     x -> x IN ({stop}))) AS n_stop,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS rt
          FROM base),
        g AS (
          SELECT doc_id, count(*) AS tt, count(DISTINCT gg) AS dd
          FROM (SELECT doc_id, {parts} AS gg
                FROM (SELECT doc_id, rt,
                             unnest(generate_series(1, len(rt) -
                                                    {ngram - 1})) AS i
                      FROM t))
          GROUP BY doc_id),
        f AS (
          SELECT t.doc_id, t.h,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 n_stop,
                 CASE WHEN len(toks) > 0 THEN CAST(floor(
                      list_sum(list_transform(toks, x -> length(x)))
                      * 1000000.0 / len(toks)) AS BIGINT)
                      ELSE 0 END AS mtl,
                 coalesce((g.tt - g.dd) * 1000000 // g.tt, 0) AS dup
          FROM t LEFT JOIN g USING (doc_id)),
        v AS (
          SELECT doc_id, h, n_tokens,
                 CASE WHEN n_stop < {min_stopwords} THEN 'lang'
                      WHEN n_tokens < {min_tokens} THEN 'short'
                      WHEN mtl NOT BETWEEN {min_mtl_u6}
                           AND {max_mtl_u6} THEN 'lexical'
                      WHEN dup > {max_dup_u6} THEN 'repetition'
                      ELSE '' END AS pre
          FROM f)
        SELECT doc_id, n_tokens,
               CASE WHEN pre <> '' THEN pre
                    WHEN doc_id = min(doc_id) OVER (
                        PARTITION BY CASE WHEN pre = '' THEN h
                                     ELSE 'f' || CAST(doc_id AS VARCHAR)
                                     END)
                      THEN 'keep'
                    ELSE 'duplicate' END AS verdict
        FROM v"""


# ---------------------------------------------------------------------------
# Exact duplicate-substring detection (Lee et al. 2021, "Deduplicating
# Training Data Makes Language Models Better", arXiv:2107.06499) at
# token-window granularity: every run of `window` consecutive whitespace
# tokens is a key; a window string occurring >= 2 times corpus-wide
# (across OR within documents) marks each of its occurrences as
# duplicated text. The suffix-array of the paper is replaced by the
# shuffle-native equivalent — hash-partition the window keys — which is
# the shape that scales on Ray Data.

def substring_dup(docs, window=8, text_col="text"):
    """Per-document duplicated-substring profile.

    Returns (doc_id, n_windows, n_dup_windows, n_dup_distinct):
    total token-window positions, positions whose window string repeats
    anywhere in the corpus, and distinct repeated window strings in the
    document. Documents with fewer than ``window`` tokens drop out
    (they have no windows), matching the SQL oracle.

    Scale shape: ONE feature pass tokenizes and hashes each document's
    windows (text never leaves its batch); the first shuffle carries
    only (key:int64, doc_id, cnt, n_windows) rows — per-batch combiner
    semantics: a document repeating one window k times contributes ONE
    row with cnt=k, and every document also rides the same exchange
    under a negative singleton key so zero-duplicate documents still
    reach the output. groupby(key) flags groups with total >= 2; the
    second shuffle re-groups by doc_id to sum the flags. Window keys
    are the top 60 bits of md5 (collision merges two distinct window
    strings — negligible at any realistic corpus size and absent at
    test scale, where the oracle compares by the window string itself).
    At 100 TB the exchange volume is ~n_tokens x 20 bytes per doc;
    pass ``window`` large / pre-gate the corpus to bound it.
    """
    w = int(window)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        keys, ids, cnts, nws = [], [], [], []
        for doc_id, s in zip(df["doc_id"], df[text_col]):
            toks = [t for t in s.split(" ") if t]
            n_win = len(toks) - w + 1
            if n_win <= 0:
                continue
            seen: dict = {}
            for j in range(n_win):
                win = " ".join(toks[j:j + w])
                k = int(hashlib.md5(win.encode()).hexdigest()[:15], 16)
                seen[k] = seen.get(k, 0) + 1
            # base row: carries n_windows under a singleton key
            keys.append(-int(doc_id) - 1)
            ids.append(int(doc_id))
            cnts.append(0)
            nws.append(n_win)
            for k, c in seen.items():
                keys.append(k)
                ids.append(int(doc_id))
                cnts.append(c)
                nws.append(0)
        return pd.DataFrame({
            "key": np.array(keys, np.int64),
            "doc_id": np.array(ids, np.int64),
            "cnt": np.array(cnts, np.int64),
            "nw": np.array(nws, np.int64)})

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        if (g["key"].iloc[0] < 0) or (g["cnt"].sum() < 2):
            # base rows pass through; unique windows contribute nothing
            g = g[g["key"] < 0]
            return pd.DataFrame({
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "dup_pos": np.zeros(len(g), np.int64),
                "dup_distinct": np.zeros(len(g), np.int64),
                "nw": g["nw"].to_numpy(np.int64)})
        # one distinct-credit per (window, doc): duplicate doc_id input
        # rows emit one explode row EACH, matching the oracle's
        # count(DISTINCT w) only if credited once here
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "dup_pos": g["cnt"].to_numpy(np.int64),
            "dup_distinct": (~g["doc_id"].duplicated()).to_numpy()
            .astype(np.int64),
            "nw": np.zeros(len(g), np.int64)})

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": g["doc_id"].iloc[:1].astype("int64"),
            "n_windows": [np.int64(g["nw"].sum())],
            "n_dup_windows": [np.int64(g["dup_pos"].sum())],
            "n_dup_distinct": [np.int64(g["dup_distinct"].sum())]})

    return docs.map_batches(explode, batch_format="pandas") \
        .groupby("key").map_groups(flag, batch_format="pandas") \
        .groupby("doc_id").map_groups(per_doc, batch_format="pandas")


def substring_dup_sql(window=8,
                      base_sql="SELECT doc_id, text FROM documents"):
    """DuckDB oracle for :func:`substring_dup` — groups by the window
    STRING itself (the engine's md5-60bit key is an implementation
    detail)."""
    w = int(window)
    return f"""
        WITH base AS ({base_sql}),
        t AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '')
                   AS toks
          FROM base),
        win AS (
          SELECT doc_id,
                 array_to_string(toks[g:g+{w - 1}], ' ') AS w
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(
                           1, len(toks) - {w - 1})) AS g
                FROM t)),
        c AS (SELECT w, count(*) AS total FROM win GROUP BY w),
        d AS (
          SELECT win.doc_id,
                 count(*) AS n_dup,
                 count(DISTINCT win.w) AS n_dup_distinct
          FROM win JOIN c USING (w) WHERE c.total >= 2
          GROUP BY win.doc_id),
        nw AS (SELECT doc_id, count(*) AS n_windows FROM win
               GROUP BY doc_id)
        SELECT nw.doc_id,
               CAST(n_windows AS BIGINT) AS n_windows,
               CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_windows,
               CAST(coalesce(d.n_dup_distinct, 0) AS BIGINT)
                 AS n_dup_distinct
        FROM nw LEFT JOIN d USING (doc_id)"""


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk): the standard LLM-pretraining
# layout — concatenate all documents in doc_id order into one token
# stream and cut it into fixed seq_len chunks. The distributed core is
# a GLOBAL ordered prefix sum over token counts, done the scale-correct
# way: one narrow pass tokenizes (text never leaves its batch), ordered
# range buckets give per-bucket partial sums (P driver-side numbers),
# and a per-bucket cumsum plus the broadcast bucket base yields every
# document's exact stream offset.

def pack_chunks(docs, seq_len=2048, text_col="text", n_parts=64):
    """Per-document placement in the packed token stream.

    Returns (doc_id, n_tokens, tok_start, chunk_first, chunk_last,
    n_chunks): the document's half-open token interval start in the
    concatenated doc_id-ordered stream, and the fixed-``seq_len`` chunk
    ids it spans (``-1``/``0`` for empty documents).

    Scale shape: pass 1 reduces each document to 16 bytes
    (doc_id, n_tokens) — a ~1000x narrowing — and MATERIALIZES that
    narrow table so tokenization runs once (at 10^10 docs this is
    ~160 GB across the cluster's object store, the legitimate use of
    materialize). Bucket = doc_id // span with span from a tiny
    max(doc_id) aggregate, so buckets are ordered BY CONSTRUCTION and
    the exclusive-prefix base offsets are a P-row driver computation
    broadcast in the closure. The final groupby(part) sorts each bucket
    locally and cumsums — batching/partitioning-invariant, exact int64.
    """
    def counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.split(" ")
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": toks.map(
                lambda ts: sum(1 for t in ts if t)).astype("int64")})

    tok = docs.map_batches(counts, batch_format="pandas").materialize()
    hi = tok.max("doc_id")
    if hi is None:        # empty corpus -> empty, correctly-typed result
        import pyarrow as pa
        import ray.data
        return ray.data.from_arrow(pa.table({
            c: pa.array([], pa.int64())
            for c in ("doc_id", "n_tokens", "tok_start", "chunk_first",
                      "chunk_last", "n_chunks")}))
    span = max(1, (int(hi) + int(n_parts)) // int(n_parts))

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = (df["doc_id"] // span).astype("int64")
        return df

    parted = tok.map_batches(add_part, batch_format="pandas")
    sums = parted.groupby("part").aggregate(Sum("n_tokens")).to_pandas()
    sums = sums.sort_values("part").reset_index(drop=True)
    csum = sums["sum(n_tokens)"].cumsum().shift(fill_value=0)
    base = dict(zip(sums["part"].astype(int), csum.astype(int)))
    L = int(seq_len)

    def place(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        n = g["n_tokens"].to_numpy(np.int64)
        start = base[int(g["part"].iloc[0])] + np.concatenate(
            ([0], np.cumsum(n)[:-1]))
        first = np.where(n > 0, start // L, -1)
        last = np.where(n > 0, (start + n - 1) // L, -1)
        return pd.DataFrame({
            "doc_id": g["doc_id"],
            "n_tokens": g["n_tokens"],
            "tok_start": pd.Series(start, dtype="int64"),
            "chunk_first": pd.Series(first, dtype="int64"),
            "chunk_last": pd.Series(last, dtype="int64"),
            "n_chunks": pd.Series(np.where(n > 0, last - first + 1, 0),
                                  dtype="int64")})

    return parted.groupby("part").map_groups(place, batch_format="pandas")


def pack_chunks_sql(seq_len=2048,
                    base_sql="SELECT doc_id, text FROM documents"):
    """DuckDB oracle for :func:`pack_chunks` — a plain cumulative-sum
    window over doc_id order."""
    L = int(seq_len)
    return f"""
        WITH base AS ({base_sql}),
        t AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(text, ' '),
                          x -> x <> '')) AS BIGINT) AS n_tokens
          FROM base),
        s AS (
          SELECT doc_id, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (
                     ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
          FROM t)
        SELECT doc_id, n_tokens, tok_start,
               CAST(CASE WHEN n_tokens > 0
                    THEN tok_start // {L} ELSE -1 END AS BIGINT)
                 AS chunk_first,
               CAST(CASE WHEN n_tokens > 0
                    THEN (tok_start + n_tokens - 1) // {L} ELSE -1 END
                 AS BIGINT) AS chunk_last,
               CAST(CASE WHEN n_tokens > 0
                    THEN (tok_start + n_tokens - 1) // {L}
                         - tok_start // {L} + 1
                    ELSE 0 END AS BIGINT) AS n_chunks
        FROM s"""


def chunk_spans(docs, seq_len=256, stride=192, text_col="text"):
    """Per-document OVERLAPPING sliding-window chunk spans — the RAG /
    long-context training chunker (:func:`pack_chunks` packs docs into
    a disjoint global stream; this cuts EACH doc into windows of
    ``seq_len`` tokens advancing by ``stride``, so consecutive chunks
    overlap by ``seq_len - stride`` tokens of context). Chunk i of a
    doc covers whitespace tokens [i·stride, min(i·stride + seq_len,
    n)); windows start while i·stride < n, so every token is covered
    and the tail chunk may be short. Returns one row per chunk:
    (doc_id, chunk_id, tok_start, tok_end, n_chunk_tokens).

    Scale shape: pure per-row explode — the token count comes from one
    Arrow regex kernel over the batch, the chunk rows are built with
    np.repeat/arange (no Python loop over docs), nothing shuffles, and
    the output is bounded by Σ ceil(n/stride). Text never leaves the
    batch; downstream slicing joins spans back by doc_id."""
    import pyarrow as pa
    import pyarrow.compute as pc

    L, S = int(seq_len), int(stride)
    if L <= 0 or S <= 0 or S > L:
        raise ValueError("chunk_spans: need 0 < stride <= seq_len")

    def explode(t: pa.Table) -> pa.Table:
        txt = pc.cast(t[text_col], pa.string())
        n = pc.count_substring_regex(txt, r"[^ ]+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        n_chunks = np.where(n > 0, (n + S - 1) // S, 0)
        tot = int(n_chunks.sum())
        if not tot:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "tok_start": pa.array([], pa.int64()),
                "tok_end": pa.array([], pa.int64()),
                "n_chunk_tokens": pa.array([], pa.int64())})
        rid = np.repeat(np.arange(len(ids), dtype=np.int64), n_chunks)
        cid = (np.arange(tot, dtype=np.int64)
               - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
        start = cid * S
        end = np.minimum(start + L, n[rid])
        return pa.table({
            "doc_id": pa.array(ids[rid], pa.int64()),
            "chunk_id": pa.array(cid, pa.int64()),
            "tok_start": pa.array(start, pa.int64()),
            "tok_end": pa.array(end, pa.int64()),
            "n_chunk_tokens": pa.array(end - start, pa.int64())})

    return docs.map_batches(explode, batch_format="pyarrow")


def chunk_spans_sql(seq_len=256, stride=192,
                    base_sql="SELECT doc_id, text FROM documents"):
    """DuckDB oracle for :func:`chunk_spans` — a generate_series
    lateral per doc over the identical integer window arithmetic."""
    L, S = int(seq_len), int(stride)
    return f"""
        WITH base AS ({base_sql}),
        t AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(text, ' '),
                          x -> x <> '')) AS BIGINT) AS n
          FROM base WHERE len(list_filter(string_split(text, ' '),
                           x -> x <> '')) > 0)
        SELECT t.doc_id,
               CAST(g.i AS BIGINT) AS chunk_id,
               CAST(g.i * {S} AS BIGINT) AS tok_start,
               CAST(least(g.i * {S} + {L}, t.n) AS BIGINT) AS tok_end,
               CAST(least(g.i * {S} + {L}, t.n) - g.i * {S} AS BIGINT)
                 AS n_chunk_tokens
        FROM t, LATERAL (
          SELECT unnest(generate_series(0,
              CAST((t.n + {S} - 1) // {S} AS BIGINT) - 1)) AS i) g"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (GPT-3 appendix C / Lee et al. 2021 style):
# mark training documents that share any n-token window with an
# evaluation benchmark. The benchmark side is SMALL (eval sets are
# megabytes even when the corpus is 100 TB), so the scale-correct shape
# is a broadcast set-membership probe, not a shuffle join: the
# benchmark's distinct windows are collected once, ray.put once, and
# every probe batch reads the same object-store copy.

def decontaminate(docs, bench, window=8, text_col="text"):
    """Per-document contamination profile against a benchmark table.

    ``bench`` is a Dataset of (doc_id, text) benchmark rows. Returns
    (doc_id, n_windows, n_contam, n_contam_distinct): total
    ``window``-token positions, positions whose window string occurs in
    the benchmark, and distinct such window strings. Documents shorter
    than ``window`` tokens report 0/0/0 (they cannot collide).

    Exactness: membership is by the window STRING (no hashes → no
    false positives); a Bloom-bitmap variant (see
    relational.hash_join(bloom_prune=...)) is the fallback if a
    benchmark ever outgrows worker heap.
    """
    import ray

    w = int(window)

    def wins(toks):
        return [" ".join(toks[j:j + w])
                for j in range(len(toks) - w + 1)]

    def bench_windows(df: pd.DataFrame) -> pd.DataFrame:
        out = set()
        for s in df[text_col]:
            out.update(wins([t for t in s.split(" ") if t]))
        return pd.DataFrame({"w": pd.Series(sorted(out), dtype=object)})

    bw = bench.map_batches(bench_windows, batch_format="pandas") \
        .to_pandas()
    bench_set = ray.put(
        frozenset(bw["w"]) if "w" in bw.columns else frozenset())

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        bs = ray.get(bench_set)
        n_win, n_con, n_dis = [], [], []
        for s in df[text_col]:
            ws = wins([t for t in s.split(" ") if t])
            hit = [x for x in ws if x in bs]
            n_win.append(len(ws))
            n_con.append(len(hit))
            n_dis.append(len(set(hit)))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_windows": pd.Series(n_win, dtype="int64"),
            "n_contam": pd.Series(n_con, dtype="int64"),
            "n_contam_distinct": pd.Series(n_dis, dtype="int64")})

    return docs.map_batches(probe, batch_format="pandas")


def decontaminate_sql(window=8,
                      base_sql="SELECT doc_id, text FROM documents",
                      bench_sql="SELECT doc_id, text FROM documents "
                                "WHERE doc_id % 17 = 3"):
    """DuckDB oracle for :func:`decontaminate` — exploded windows
    joined against the benchmark's distinct windows."""
    w = int(window)
    return f"""
        WITH base AS ({base_sql}),
        bench AS ({bench_sql}),
        t AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '')
                   AS toks
          FROM base),
        win AS (
          SELECT doc_id,
                 array_to_string(toks[g:g+{w - 1}], ' ') AS w
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(
                           1, len(toks) - {w - 1})) AS g
                FROM t)),
        bt AS (
          SELECT list_filter(string_split(text, ' '), x -> x <> '')
                   AS toks
          FROM bench),
        bwin AS (
          SELECT DISTINCT array_to_string(toks[g:g+{w - 1}], ' ') AS w
          FROM (SELECT toks,
                       unnest(generate_series(
                           1, len(toks) - {w - 1})) AS g
                FROM bt)),
        hits AS (
          SELECT win.doc_id, count(*) AS n_contam,
                 count(DISTINCT win.w) AS n_contam_distinct
          FROM win JOIN bwin USING (w) GROUP BY win.doc_id),
        nw AS (SELECT doc_id, count(*) AS n_windows FROM win
               GROUP BY doc_id)
        SELECT b.doc_id,
               CAST(coalesce(nw.n_windows, 0) AS BIGINT) AS n_windows,
               CAST(coalesce(hits.n_contam, 0) AS BIGINT) AS n_contam,
               CAST(coalesce(hits.n_contam_distinct, 0) AS BIGINT)
                 AS n_contam_distinct
        FROM base b
        LEFT JOIN nw ON nw.doc_id = b.doc_id
        LEFT JOIN hits ON hits.doc_id = b.doc_id"""


_TOKEN_RE = _re.compile(r"[a-z0-9]+")


def inverted_index(docs, vocab_prefix="0", text_col="text"):
    """Inverted-index dictionary build over a deterministic vocabulary
    slice: per-term document frequency and total term frequency for
    every term whose ``md5(term)`` hex starts with ``vocab_prefix``
    (tokens: maximal [a-z0-9]+ runs of the lowercased text — same
    tokenizer as :func:`bigram_topk`). The search-index primitive of a
    retrieval / data-curation pipeline.

    Scale shape: each batch emits one (term, df, tf) partial per
    distinct in-slice term (combiner-before-shuffle — never a row per
    token), the single ``groupby(term)`` exchange carries fixed-width
    rows, and the md5-prefix slice is exactly how the full build
    shards at 100 TB: run one job per prefix and every job's exchange
    holds 1/16th of the dictionary (postings lists for a term land in
    one group by construction). Returns (term, df, tf) — df = number
    of documents containing the term, tf = total occurrences.
    """
    pre = str(vocab_prefix)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        tf = Counter()
        dfc = Counter()
        in_slice = {}
        for s in df[text_col]:
            c = Counter(_TOKEN_RE.findall(s.lower()))
            for t, n in c.items():
                hit = in_slice.get(t)
                if hit is None:
                    hit = hashlib.md5(
                        t.encode()).hexdigest().startswith(pre)
                    in_slice[t] = hit
                if hit:
                    tf[t] += n
                    dfc[t] += 1
        terms = list(tf.keys())
        return pd.DataFrame({
            "term": pd.Series(terms, dtype=object),
            "df_part": np.fromiter((dfc[t] for t in terms), np.int64,
                                   len(terms)),
            "tf_part": np.fromiter((tf[t] for t in terms), np.int64,
                                   len(terms))})

    return docs.map_batches(partial, batch_format="pandas") \
        .groupby("term").aggregate(
            Sum("df_part", alias_name="df"),
            Sum("tf_part", alias_name="tf"))


def inverted_index_sql(vocab_prefix="0",
                       base_sql="SELECT doc_id, text FROM documents"):
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                   AS term
          FROM ({base_sql})),
        per_doc AS (
          SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2)
        SELECT term, CAST(count(*) AS BIGINT) AS df,
               CAST(sum(tf) AS BIGINT) AS tf
        FROM per_doc
        WHERE md5(term) LIKE '{vocab_prefix}%'
        GROUP BY term"""


def doc_freq_score(docs, vocab_size=512):
    """Unigram corpus-frequency quality score — the broadcast-language-
    model shape (a KenLM-style scorer with the log table replaced by
    integer counts so the result is hash-exact): PASS 1 builds the
    global unigram count table (per-batch Counter partials bound the
    shuffle to one row per (batch, distinct token), then a distributed
    sort+limit keeps the top-``vocab_size`` vocabulary with a
    deterministic (count desc, token asc) tiebreak — the ONLY driver
    collect is those V rows); the model dict rides ``ray.put`` into
    PASS 2, which scores every document against it (OOV tokens
    contribute 0). Returns (doc_id, n_tokens, sum_freq, mean_freq_u6),
    all int64.

    At 10^12 docs the model is still V rows broadcast once per worker —
    never a join shuffle of the corpus against the count table."""
    import re

    import ray

    tok = re.compile(r"[a-z0-9]+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c = Counter()
        for s in df["text"]:
            c.update(tok.findall(s.lower()))
        return pd.DataFrame({"tok": list(c.keys()),
                             "n": np.fromiter(c.values(), np.int64,
                                              len(c))})

    vocab_rows = docs.map_batches(partial, batch_format="pandas") \
        .groupby("tok").aggregate(Sum("n", alias_name="n_total")) \
        .sort(["n_total", "tok"], descending=[True, False]) \
        .limit(vocab_size).take_all()
    model_ref = ray.put({r["tok"]: int(r["n_total"]) for r in vocab_rows})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        model = ray.get(model_ref)
        ids, nt, sf = [], [], []
        for i, s in zip(df["doc_id"], df["text"]):
            ts = tok.findall(s.lower())
            ids.append(int(i))
            nt.append(len(ts))
            sf.append(sum(model.get(t, 0) for t in ts))
        nt = np.array(nt, np.int64)
        sf = np.array(sf, np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = np.where(nt > 0, sf * 1_000_000 // np.maximum(nt, 1),
                            np.int64(0))
        return pd.DataFrame({
            "doc_id": np.array(ids, np.int64), "n_tokens": nt,
            "sum_freq": sf, "mean_freq_u6": mean.astype(np.int64)})

    return docs.map_batches(score, batch_format="pandas")


def doc_freq_score_sql(vocab_size=512):
    """DuckDB oracle for :func:`doc_freq_score` (same tokenizer,
    vocabulary tiebreak, OOV-as-zero, and floor division)."""
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                   AS tok
          FROM documents),
        cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        vocab AS (SELECT tok, c FROM cnt
                  ORDER BY c DESC, tok LIMIT {vocab_size}),
        joined AS (
          SELECT t.doc_id, v.c FROM toks t
          LEFT JOIN vocab v USING (tok)),
        per AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(coalesce(sum(c), 0) AS BIGINT) AS sum_freq
          FROM joined GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(p.n_tokens, 0) AS n_tokens,
               coalesce(p.sum_freq, 0) AS sum_freq,
               CAST(coalesce(p.sum_freq * 1000000 // p.n_tokens, 0)
                    AS BIGINT) AS mean_freq_u6
        FROM documents d LEFT JOIN per p USING (doc_id)"""


# ---------------------------------------------------------------------------
# CCNet-style cross-corpus duplicate-line removal (Wenzek et al. 2020,
# "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
# Data", arXiv:1911.00359): hash every line of every document, drop
# lines whose hash repeats across the corpus, keep the surviving text.
# The provided corpus has no newlines, so a "line" is a fixed run of
# `chunk` consecutive whitespace tokens (positions i*chunk..) — the
# granularity knob, not a semantic change.

def line_dedup(docs, chunk=8, min_docs=2, text_col="text"):
    """Per-document duplicate-chunk removal with ordered reconstruction.

    Drops EVERY occurrence of a chunk string that appears in at least
    ``min_docs`` DISTINCT documents (a chunk repeated only within one
    document is kept — that's :func:`gopher_repetition`'s job). Returns
    (doc_id, n_chunks, n_dropped, clean_text) for every input document,
    ``clean_text`` = kept chunks joined by ' ' in document order.

    Scale shape: pass 1 explodes to (key:int64 md5-60bit, doc_id, idx)
    — ~24 bytes per chunk; the text never rides the flag exchange.
    groupby(key) emits (doc_id, idx) drop markers ONLY for flagged keys
    (exchange out is bounded by the duplicate mass, not the corpus).
    Reconstruction is a tag-union groupby(doc_id) — the corpus crosses
    one exchange once, exactly like any repartition — and re-tokenizes
    inside the group, so no chunk text is ever shipped twice. md5-60bit
    key collisions merge two distinct chunk strings (negligible odds at
    any realistic corpus size; absent at oracle scale, where the SQL
    groups by the chunk string itself).
    """
    import ray.data

    c = int(chunk)
    md = int(min_docs)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        keys, ids, idxs = [], [], []
        for doc_id, s in zip(df["doc_id"], df[text_col]):
            toks = [t for t in s.split(" ") if t]
            for j in range(0, len(toks), c):
                win = " ".join(toks[j:j + c])
                keys.append(int(hashlib.md5(
                    win.encode()).hexdigest()[:15], 16))
                ids.append(int(doc_id))
                idxs.append(j // c)
        return pd.DataFrame({
            "key": np.array(keys, np.int64),
            "doc_id": np.array(ids, np.int64),
            "idx": np.array(idxs, np.int64)})

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        if g["doc_id"].nunique() < md:
            return pd.DataFrame({
                "doc_id": np.array([], np.int64),
                "idx": np.array([], np.int64),
                "tag": np.array([], np.int64),
                "text": pd.Series([], dtype=object)})
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "idx": g["idx"].to_numpy(np.int64),
            "tag": np.ones(len(g), np.int64),
            "text": pd.Series([""] * len(g), dtype=object)})

    markers = docs.map_batches(explode, batch_format="pandas") \
        .groupby("key").map_groups(flag, batch_format="pandas")

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "idx": np.full(len(df), -1, np.int64),
            "tag": np.zeros(len(df), np.int64),
            "text": df[text_col].astype(object)})

    tagged = docs.map_batches(tag_docs, batch_format="pandas") \
        .union(markers)

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["tag"] == 0]
        drop = set(g.loc[g["tag"] == 1, "idx"].tolist())
        s = base["text"].iloc[0]
        toks = [t for t in s.split(" ") if t]
        kept, n_chunks = [], 0
        for j in range(0, len(toks), c):
            if (j // c) not in drop:
                kept.append(" ".join(toks[j:j + c]))
            n_chunks += 1
        return pd.DataFrame({
            "doc_id": np.array([int(base["doc_id"].iloc[0])], np.int64),
            "n_chunks": np.array([n_chunks], np.int64),
            "n_dropped": np.array([len(drop)], np.int64),
            "clean_text": pd.Series([" ".join(kept)], dtype=object)})

    return tagged.groupby("doc_id").map_groups(rebuild,
                                               batch_format="pandas")


def line_dedup_sql(chunk=8, min_docs=2,
                   base_sql="SELECT doc_id, text FROM documents"):
    """DuckDB oracle for :func:`line_dedup` — groups by the chunk STRING
    itself (the engine's md5-60bit key is an implementation detail)."""
    c = int(chunk)
    return f"""
        WITH base AS ({base_sql}),
        t AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '')
                   AS toks
          FROM base),
        ch AS (
          SELECT doc_id, ci - 1 AS idx,
                 array_to_string(toks[(ci-1)*{c}+1 : ci*{c}], ' ') AS s
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(
                           1, CAST(ceil(len(toks) / {c}.0) AS BIGINT)))
                         AS ci
                FROM t)),
        dup AS (SELECT s FROM ch GROUP BY s
                HAVING count(DISTINCT doc_id) >= {int(min_docs)}),
        kept AS (SELECT ch.doc_id, ch.idx, ch.s FROM ch
                 WHERE ch.s NOT IN (SELECT s FROM dup)),
        agg AS (SELECT doc_id, count(*) AS n_kept,
                       string_agg(s, ' ' ORDER BY idx) AS clean_text
                FROM kept GROUP BY doc_id),
        nc AS (SELECT doc_id, count(*) AS n_chunks FROM ch
               GROUP BY doc_id)
        SELECT b.doc_id,
               CAST(coalesce(nc.n_chunks, 0) AS BIGINT) AS n_chunks,
               CAST(coalesce(nc.n_chunks, 0) - coalesce(agg.n_kept, 0)
                    AS BIGINT) AS n_dropped,
               coalesce(agg.clean_text, '') AS clean_text
        FROM base b
        LEFT JOIN nc ON nc.doc_id = b.doc_id
        LEFT JOIN agg ON agg.doc_id = b.doc_id"""


# ---------------------------------------------------------------------------
# Compressibility quality signal (the Gopher-family repetitiveness
# gate — Rae et al. 2021 "Scaling Language Models: ... Gopher",
# arXiv:2112.11446, filters documents by how well they deflate:
# too-compressible = boilerplate/repetition, too-incompressible =
# binary junk/noise). stdlib zlib at a fixed level is deterministic,
# so the per-doc ratio is hash-exact.

def compression_signal(docs, level=6, lo_u6=430_000, hi_u6=650_000,
                       text_col="text"):
    """Per-document deflate-compressibility gate.

    Returns (doc_id, n_raw, n_comp, ratio_u6, keep): UTF-8 byte count,
    ``zlib.compress(..., level)`` byte count, the integer ratio
    ``n_comp * 1e6 // n_raw`` (1e6 for empty docs), and the verdict
    ``lo_u6 <= ratio_u6 <= hi_u6``.

    Scale shape: embarrassingly parallel map_batches — no exchange at
    all; the compressor object is per-call stdlib (no actor state
    needed). This is the cheapest of the curation gates and typically
    runs fused with tokenize/langid passes.
    """
    import zlib

    lv = int(level)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids, raws, comps = [], [], []
        for doc_id, s in zip(df["doc_id"], df[text_col]):
            b = s.encode("utf-8")
            ids.append(int(doc_id))
            raws.append(len(b))
            comps.append(len(zlib.compress(b, lv)))
        raws = np.array(raws, np.int64)
        comps = np.array(comps, np.int64)
        ratio = np.where(raws > 0,
                         comps * 1_000_000 // np.maximum(raws, 1),
                         np.int64(1_000_000)).astype(np.int64)
        return pd.DataFrame({
            "doc_id": np.array(ids, np.int64),
            "n_raw": raws, "n_comp": comps, "ratio_u6": ratio,
            "keep": (ratio >= lo_u6) & (ratio <= hi_u6)})

    return docs.map_batches(fn, batch_format="pandas")


URL_RE = r"https?://([A-Za-z0-9.-]+)"


class UrlDomainCounter:
    """Actor-pool regex-extraction stage: the compiled pattern is built
    ONCE per actor in ``__init__`` (the stateful-setup contract — a
    plain function would re-enter `re` per batch; a per-row compile
    would be the classic hot-loop bug). Emits per-batch (domain, n)
    partials — the combiner before the tiny groupby(domain) merge."""

    def __init__(self, pattern=URL_RE):
        import re
        self.rx = re.compile(pattern)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c = Counter()
        for s in df["text"]:
            c.update(self.rx.findall(s))
        if not c:
            return pd.DataFrame({
                "domain": pd.Series([], dtype=object),
                "n_urls": pd.Series([], dtype="int64")})
        ks = list(c.keys())
        return pd.DataFrame({
            "domain": pd.Series(ks, dtype=object),
            "n_urls": pd.Series([c[k] for k in ks], dtype="int64")})


def url_domains(docs, pattern=URL_RE, concurrency=None, batch_size=256):
    """Per-domain URL occurrence counts over the corpus (link-graph /
    source-attribution front of a crawl pipeline). One actor-pool
    extraction pass with per-batch count partials, then one
    groupby(domain) merge of tiny rows."""
    from ray.data.aggregate import Sum
    if concurrency is None:
        from .unmix import default_pool_size
        concurrency = default_pool_size(reserve=2, cap=8)
    parts = docs.map_batches(
        UrlDomainCounter, fn_constructor_kwargs={"pattern": pattern},
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency)
    return parts.groupby("domain").aggregate(
        Sum("n_urls", alias_name="n_urls")).map_batches(
        lambda df: df.astype({"n_urls": "int64"}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# edit-distance-1 token similarity join via deletion-neighborhood
# blocking (the spell-check / fuzzy-vocabulary join; Norvig's deletion
# trick as a distributed blocking key)

def _lev_le1(x, y):
    """Exact check lev(x, y) == 1 for x != y (candidates are lev <= 2
    by construction, so this is the final verify)."""
    lx, ly = len(x), len(y)
    if lx == ly:
        return sum(a != b for a, b in zip(x, y)) == 1
    if abs(lx - ly) != 1:
        return False
    if lx > ly:
        x, y, lx, ly = y, x, ly, lx
    # x is shorter by one: subsequence check with one skip
    i = j = skipped = 0
    while i < lx and j < ly:
        if x[i] == y[j]:
            i += 1
            j += 1
        elif skipped:
            return False
        else:
            skipped = 1
            j += 1
    return True


def edit_distance_join(docs, text_col="text"):
    """All pairs of DISTINCT corpus tokens at Levenshtein distance
    exactly 1, with their corpus frequencies — the fuzzy-vocabulary
    self-join behind spell-normalization and OCR-noise linking
    (engine-new; no reference analogue).

    Scale shape — three bounded exchanges, none corpus-sized:
    1. token counts: per-batch split + dedup combiner, then one
       ``groupby(token)`` merge — the exchange carries one (token, n)
       row per distinct token per batch, never per occurrence;
    2. deletion-neighborhood blocking over the DISTINCT-token table
       (vocabulary-sized, corpus-size-independent): each token emits
       itself plus its len(token) single-character-deletion variants as
       blocking keys. Any lev-1 pair shares a key (substitution: both
       delete the differing position; insertion/deletion: the shorter
       token IS a deletion variant of the longer and is its own key),
       so the blocking is EXHAUSTIVE — no lev-1 pair can be missed;
    3. per-key all-pairs candidates (bucket size is an alphabet
       property of the vocabulary, not a corpus property) verified by
       the exact ``_lev_le1`` predicate (candidates are lev<=2; e.g.
       transposed middles share two keys at lev 2 and are rejected),
       then one pair-key groupby dedups pairs that share several keys.

    Output: tok_a < tok_b, n_a, n_b (corpus occurrence counts).
    """
    from ray.data.aggregate import Sum

    def tok_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].astype(str).str.split(" ").explode()
        toks = toks[toks.astype(bool)]
        g = toks.value_counts()
        return pd.DataFrame({"token": g.index.astype(str),
                             "n": g.to_numpy(np.int64)})

    vocab = docs.select_columns([text_col]).map_batches(
        tok_counts, batch_format="pandas").groupby("token").aggregate(
        Sum("n", alias_name="n"))

    def explode_deletions(df: pd.DataFrame) -> pd.DataFrame:
        keys, toks, ns = [], [], []
        for t, n in zip(df["token"].astype(str),
                        df["n"].to_numpy(np.int64)):
            keys.append(t)
            toks.append(t)
            ns.append(n)
            # len-1 tokens emit the "" variant: that bucket is what
            # blocks single-character substitution pairs ('a' vs 'b'),
            # and its size is bounded by the alphabet
            for i in range(len(t)):
                keys.append(t[:i] + t[i + 1:])
                toks.append(t)
                ns.append(n)
        return pd.DataFrame({"bkey": keys, "token": toks,
                             "n": pd.Series(ns, dtype="int64")})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        toks = g["token"].astype(str).to_numpy()
        ns = g["n"].to_numpy(np.int64)
        order = np.argsort(toks, kind="stable")
        toks, ns = toks[order], ns[order]
        rows = {"tok_a": [], "tok_b": [], "n_a": [], "n_b": []}
        for i in range(len(toks)):
            for j in range(i + 1, len(toks)):
                if toks[i] == toks[j]:
                    continue
                if _lev_le1(toks[i], toks[j]):
                    rows["tok_a"].append(toks[i])
                    rows["tok_b"].append(toks[j])
                    rows["n_a"].append(int(ns[i]))
                    rows["n_b"].append(int(ns[j]))
        out = pd.DataFrame(rows)
        return out.astype({"n_a": "int64", "n_b": "int64"}) if len(out) \
            else pd.DataFrame({
                "tok_a": pd.Series([], dtype=object),
                "tok_b": pd.Series([], dtype=object),
                "n_a": pd.Series([], dtype="int64"),
                "n_b": pd.Series([], dtype="int64")})

    cand = vocab.map_batches(explode_deletions, batch_format="pandas")\
        .groupby("bkey").map_groups(bucket_pairs, batch_format="pandas")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1]

    return cand.groupby(["tok_a", "tok_b"]).map_groups(
        first, batch_format="pandas")


def edit_distance_join_sql(aug_text_expr="text"):
    """DuckDB oracle for :func:`edit_distance_join`: exhaustive
    vocabulary self-join under ``levenshtein() = 1`` (the engine's
    deletion-neighborhood blocking must reproduce it exactly).
    ``aug_text_expr`` lets callers plant misspellings inline as a pure
    SQL function of doc_id, matching the engine side's construction."""
    return f"""
        WITH aug AS (SELECT doc_id, {aug_text_expr} AS t
                     FROM documents),
        tok AS (SELECT unnest(string_split(t, ' ')) AS token FROM aug),
        cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n
                FROM tok WHERE token <> '' GROUP BY token)
        SELECT a.token AS tok_a, b.token AS tok_b,
               a.n AS n_a, b.n AS n_b
        FROM cnt a JOIN cnt b
          ON a.token < b.token
         AND levenshtein(a.token, b.token) = 1"""


def bpe_train(docs, n_merges=12, text_col="text"):
    """Distributed BPE vocabulary training (Sennrich et al. 2016,
    arXiv:1508.07909) — the tokenizer-fitting step of an LLM data
    pipeline, run over the corpus instead of a sample.

    The corpus-scale work happens ONCE: a per-batch word-Counter
    combiner feeds one ``groupby(word)`` exchange, and everything
    after operates on the DISTINCT-WORD table (Zipf-bounded — the
    classic BPE working set), never the corpus. Each of the
    ``n_merges`` rounds is (a) a pair-count pass over the word table
    (per-batch Counter combiner → ``groupby(pair)`` merge; the
    aggregated pair table is symbol-vocabulary-sized, so the driver
    argmax is O(vocab)), and (b) a rewrite pass that re-tokenizes ONLY
    the words containing the winning pair (vectorized contains
    pre-filter). Ties on the max count break to the lexicographically
    smallest (left, right) — deterministic at any partitioning.

    Words are space-joined symbol sequences seeded with characters +
    a terminal ``</w>`` marker; symbols never contain spaces (words
    come from a whitespace split), so the join is lossless. Returns
    pandas (step, lhs, rhs, pair_count) — the merge table IS the
    trained tokenizer."""
    from collections import Counter

    def wc(df: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in df[text_col]:
            c.update(t.split())
        return pd.DataFrame({
            "word": pd.Series(list(c.keys()), dtype=object),
            "n": pd.Series(
                np.fromiter(c.values(), np.int64, len(c)))})

    words = docs.map_batches(wc, batch_format="pandas")\
        .groupby("word").aggregate(Sum("n", alias_name="n"))

    def init_syms(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "syms": [" ".join(list(w) + ["</w>"]) for w in df["word"]],
            "n": df["n"].astype("int64")})

    table = words.map_batches(init_syms, batch_format="pandas")\
        .materialize()
    merges = {"step": [], "lhs": [], "rhs": [], "pair_count": []}
    for step in range(n_merges):

        def pc(df: pd.DataFrame) -> pd.DataFrame:
            c = Counter()
            for s, n in zip(df["syms"], df["n"]):
                toks = s.split(" ")
                for i in range(len(toks) - 1):
                    c[toks[i] + " " + toks[i + 1]] += int(n)
            return pd.DataFrame({
                "pair": pd.Series(list(c.keys()), dtype=object),
                "cnt": pd.Series(
                    np.fromiter(c.values(), np.int64, len(c)))})

        pairs = table.map_batches(pc, batch_format="pandas")\
            .groupby("pair").aggregate(Sum("cnt", alias_name="cnt"))\
            .to_pandas()
        if pairs.empty:
            break
        split = pairs["pair"].str.split(" ", n=1, expand=True)
        pairs = pairs.assign(lhs=split[0], rhs=split[1])
        top = pairs.sort_values(["cnt", "lhs", "rhs"],
                                ascending=[False, True, True]).iloc[0]
        a, b, ab = str(top["lhs"]), str(top["rhs"]), \
            str(top["lhs"]) + str(top["rhs"])
        merges["step"].append(step)
        merges["lhs"].append(a)
        merges["rhs"].append(b)
        merges["pair_count"].append(int(top["cnt"]))
        pat = a + " " + b

        def merge_stage(df: pd.DataFrame, a=a, b=b, ab=ab,
                        pat=pat) -> pd.DataFrame:
            syms = df["syms"].tolist()
            hit = df["syms"].str.contains(pat, regex=False).to_numpy()
            for idx in np.flatnonzero(hit):
                toks = syms[idx].split(" ")
                new, i, n_t = [], 0, len(toks)
                while i < n_t:
                    if (i + 1 < n_t and toks[i] == a
                            and toks[i + 1] == b):
                        new.append(ab)
                        i += 2
                    else:
                        new.append(toks[i])
                        i += 1
                syms[idx] = " ".join(new)
            return pd.DataFrame({
                "syms": pd.Series(syms, dtype=object),
                "n": df["n"].astype("int64")})

        table = table.map_batches(merge_stage, batch_format="pandas")\
            .materialize()
    return pd.DataFrame({
        "step": pd.Series(merges["step"], dtype="int64"),
        "lhs": pd.Series(merges["lhs"], dtype=object),
        "rhs": pd.Series(merges["rhs"], dtype=object),
        "pair_count": pd.Series(merges["pair_count"], dtype="int64")})


class BpeEncoder:
    """Tokenizer APPLICATION as an actor-pool stage — the step a
    production corpus pipeline runs over all 100 TB once the merge
    table is trained (:func:`bpe_train` / reference-free; Sennrich
    2016 greedy encode). The merge list is tiny and rides the actor
    constructor ONCE per worker; each actor keeps a word -> token-
    length memo so the per-batch cost is Zipf-bounded (distinct new
    words per batch), not corpus-bounded — the stateful-stage analog
    of the distinct-word trick bpe_train uses globally. Encoding a
    fresh word replays the merges in training order (each applied
    exhaustively left-to-right), which reproduces the training-time
    evolution of that word exactly."""

    def __init__(self, merges):
        self.merges = [(str(a), str(b), str(a) + str(b))
                       for a, b in merges]
        self.memo = {}

    def _enc_len(self, w):
        r = self.memo.get(w)
        if r is None:
            toks = list(w) + ["</w>"]
            for a, b, ab in self.merges:
                if a not in toks:
                    continue
                new, i, n_t = [], 0, len(toks)
                while i < n_t:
                    if (i + 1 < n_t and toks[i] == a
                            and toks[i + 1] == b):
                        new.append(ab)
                        i += 2
                    else:
                        new.append(toks[i])
                        i += 1
                toks = new
            r = len(toks)
            self.memo[w] = r
        return r

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        enc = self._enc_len
        n_tok = np.fromiter(
            (sum(enc(w) for w in t.split()) for t in df["text"]),
            np.int64, len(df))
        n_words = np.fromiter(
            (len(t.split()) for t in df["text"]), np.int64, len(df))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_words": n_words, "n_tokens": n_tok})


def bpe_encode(docs, merges, concurrency=None):
    """Encode every document with a trained BPE merge table; returns
    (doc_id, n_words, n_tokens). ``merges`` is an iterable of
    (lhs, rhs) in training order (e.g. ``bpe_train``'s output rows).
    Scale shape: embarrassingly parallel map — no exchange at all;
    the merge table is constructor state (broadcast once per actor,
    never per batch)."""
    from .unmix import default_pool_size

    pool = concurrency or default_pool_size(reserve=2)
    return docs.map_batches(
        BpeEncoder, fn_constructor_args=(list(merges),),
        batch_format="pandas", concurrency=pool)


def chunk_docs(docs, window=32, stride=24):
    """Overlapping token-window document chunking — the RAG /
    training-context splitter: each document becomes
    ceil(max(n,1)/stride) chunks of ``window`` whitespace tokens
    starting every ``stride`` tokens (the final chunks are shorter).
    Embarrassingly parallel flat-map, no exchange; output rows carry
    (doc_id, chunk_idx, start, n_chunk_tokens, chunk_md5) where
    chunk_md5 fingerprints the space-rejoined chunk text, so the SQL
    replay (list_slice + array_to_string + md5) pins the exact chunk
    CONTENT, not just the arithmetic. Docs with zero tokens emit no
    chunks."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "chunk_idx": [], "start": [],
                "n_chunk_tokens": [], "chunk_md5": []}
        for did, t in zip(df["doc_id"], df["text"]):
            toks = t.split()
            n = len(toks)
            ci = 0
            for start in range(0, n, stride):
                seg = toks[start:start + window]
                rows["doc_id"].append(int(did))
                rows["chunk_idx"].append(ci)
                rows["start"].append(start)
                rows["n_chunk_tokens"].append(len(seg))
                rows["chunk_md5"].append(
                    hashlib.md5(" ".join(seg).encode()).hexdigest())
                ci += 1
        return pd.DataFrame({
            "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
            "chunk_idx": pd.Series(rows["chunk_idx"], dtype="int64"),
            "start": pd.Series(rows["start"], dtype="int64"),
            "n_chunk_tokens": pd.Series(rows["n_chunk_tokens"],
                                        dtype="int64"),
            "chunk_md5": pd.Series(rows["chunk_md5"], dtype=object)})

    return docs.map_batches(fn, batch_format="pandas")


def chunk_docs_sql(window=32, stride=24):
    return f"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '')
                   AS toks
          FROM documents),
        s AS (
          SELECT doc_id, toks,
                 unnest(generate_series(0, len(toks) - 1, {stride}))
                   AS start
          FROM d WHERE len(toks) > 0)
        SELECT doc_id,
               CAST(start / {stride} AS BIGINT) AS chunk_idx,
               CAST(start AS BIGINT) AS start,
               CAST(least({window}, len(toks) - start) AS BIGINT)
                 AS n_chunk_tokens,
               md5(array_to_string(list_slice(
                   toks, start + 1,
                   least(start + {window}, len(toks))), ' '))
                 AS chunk_md5
        FROM s"""


def dsir_weights(docs, target_col="lang", target_val="en",
                 buckets=256, scale=1 << 20, seed="dsir"):
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    arXiv:2302.03169) with HASHED unigram features — the hashing is
    the scale story: the feature space is a fixed ``buckets``-wide
    table regardless of vocabulary, so the model is O(buckets) ints
    broadcast once, never a vocabulary join. The paper's log-ratio is
    replaced by an integer ratio surrogate Δ(b) = ⌊scale·(n_target(b)
    + 1) / (n_raw(b) + 1)⌋ (add-one smoothing; the global
    normalization constant is omitted — it shifts every document
    equally and does not change the resampling order), so the DuckDB
    replay is hash-exact.

    PASS 1 (corpus → buckets): per-batch Counter partials over
    md5-hashed lowercase [a-z0-9]+ tokens, one ``groupby(bucket)``
    exchange of ≤ buckets rows per batch, driver collect of exactly
    ``buckets`` rows. PASS 2: Δ rides ``ray.put`` into a stateless
    scoring map. Returns (doc_id, n_tokens, dsir_sum): the per-doc
    importance weight is dsir_sum / (scale·n_tokens), float
    postprocessing the caller does."""
    import re

    import ray

    tok = re.compile(r"[a-z0-9]+")
    B = int(buckets)

    def bucket_of(t):
        return int(hashlib.md5((t + ":" + seed).encode())
                   .hexdigest()[:8], 16) % B

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        nt = np.zeros(B, np.int64)
        nr = np.zeros(B, np.int64)
        is_t = (df[target_col] == target_val).to_numpy()
        for flag, s in zip(is_t, df["text"]):
            for t in tok.findall(s.lower()):
                b = bucket_of(t)
                nr[b] += 1
                if flag:
                    nt[b] += 1
        nz = np.flatnonzero(nr)
        return pd.DataFrame({"b": nz.astype(np.int64),
                             "n_t": nt[nz], "n_r": nr[nz]})

    cnt = docs.map_batches(partial, batch_format="pandas")\
        .groupby("b").aggregate(Sum("n_t", alias_name="n_t"),
                                Sum("n_r", alias_name="n_r"))\
        .to_pandas()
    delta = np.full(B, np.int64(scale), dtype=np.int64)
    if len(cnt):
        bb = cnt["b"].to_numpy(np.int64)
        delta[bb] = ((cnt["n_t"].to_numpy(np.int64) + 1)
                     * np.int64(scale)
                     // (cnt["n_r"].to_numpy(np.int64) + 1))
    delta_ref = ray.put(delta)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(delta_ref)
        ids, nt, ws = [], [], []
        for i, s in zip(df["doc_id"], df["text"]):
            ts = tok.findall(s.lower())
            ids.append(int(i))
            nt.append(len(ts))
            ws.append(int(sum(int(d[bucket_of(t)]) for t in ts)))
        return pd.DataFrame({
            "doc_id": np.array(ids, np.int64),
            "n_tokens": np.array(nt, np.int64),
            "dsir_sum": np.array(ws, np.int64)})

    return docs.map_batches(score, batch_format="pandas")


def dsir_weights_sql(target_val="en", buckets=256, scale=1 << 20,
                     seed="dsir"):
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                   AS tok
          FROM documents),
        tb AS (
          SELECT t.doc_id,
                 CAST(CONCAT('0x', substr(
                     md5(t.tok || ':{seed}'), 1, 8)) AS BIGINT)
                   % {buckets} AS b
          FROM toks t),
        cnt AS (
          SELECT tb.b,
                 sum(CASE WHEN d.lang = '{target_val}'
                     THEN 1 ELSE 0 END) AS n_t,
                 count(*) AS n_r
          FROM tb JOIN documents d USING (doc_id)
          GROUP BY tb.b),
        delta AS (
          SELECT b, CAST((n_t + 1) * {scale} // (n_r + 1) AS BIGINT)
                   AS dlt
          FROM cnt),
        per AS (
          SELECT tb.doc_id,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(coalesce(delta.dlt, {scale})) AS BIGINT)
                   AS dsir_sum
          FROM tb LEFT JOIN delta USING (b)
          GROUP BY tb.doc_id)
        SELECT d.doc_id,
               coalesce(p.n_tokens, 0) AS n_tokens,
               coalesce(p.dsir_sum, 0) AS dsir_sum
        FROM documents d LEFT JOIN per p USING (doc_id)"""


def bigram_lm_score(docs, vocab_size=1024, scale=1 << 20):
    """Bigram language-model quality score — the CCNet/KenLM
    perplexity-filter shape with the log table replaced by EXACT
    fixed-point conditional-probability ratios so the distributed
    result hash-checks: per in-model bigram the contribution is
    ``floor(scale · c(w1 w2) / c(w1))`` (an integer surrogate for
    p(w2|w1); monotone in it, which is all a filter threshold needs).

    THREE corpus passes, all combiner-bounded:
    1. bigram counts (per-batch Counter partials → ONE groupby →
       distributed sort+limit keeps the top-``vocab_size`` model with
       the deterministic (count desc, w1, w2) tiebreak — the only
       driver collect is those V rows);
    2. unigram counts FOR THE MODEL'S w1 SET only (the w1 set rides
       ray.put into the partials, so the groupby is bounded by V, not
       by the corpus vocabulary);
    3. stateless scoring with the V-row ratio dict broadcast once per
       worker. Returns (doc_id, n_bigrams, n_in_model, sum_cond_u) —
       all int64; OOV bigrams contribute 0 to sum and n_in_model.

    At 10^12 docs the model is still V rows broadcast once per worker —
    never a join shuffle of the corpus against the count table (the
    :func:`doc_freq_score` discipline, conditioned)."""
    import re

    import ray

    tok = re.compile(r"[a-z0-9]+")
    V = int(vocab_size)
    S = int(scale)

    def big_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c = Counter()
        for s in df["text"]:
            ts = tok.findall(s.lower())
            c.update(zip(ts, ts[1:]))
        ks = list(c.keys())
        return pd.DataFrame({
            "w1": [k[0] for k in ks], "w2": [k[1] for k in ks],
            "n": np.fromiter(c.values(), np.int64, len(c))})

    model_rows = docs.map_batches(big_partial, batch_format="pandas") \
        .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n_total")) \
        .sort(["n_total", "w1", "w2"], descending=[True, False, False]) \
        .limit(V).take_all()
    w1_set = {r["w1"] for r in model_rows}
    w1_ref = ray.put(w1_set)

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        keep = ray.get(w1_ref)
        c = Counter()
        for s in df["text"]:
            c.update(t for t in tok.findall(s.lower()) if t in keep)
        return pd.DataFrame({"w1": list(c.keys()),
                             "n": np.fromiter(c.values(), np.int64,
                                              len(c))})

    uni_rows = docs.map_batches(uni_partial, batch_format="pandas") \
        .groupby("w1").aggregate(Sum("n", alias_name="n_uni")).take_all()
    cu = {r["w1"]: int(r["n_uni"]) for r in uni_rows}
    ratio = {(r["w1"], r["w2"]): S * int(r["n_total"]) // cu[r["w1"]]
             for r in model_rows}
    model_ref = ray.put(ratio)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        model = ray.get(model_ref)
        ids, nb, ni, sc = [], [], [], []
        for i, s in zip(df["doc_id"], df["text"]):
            ts = tok.findall(s.lower())
            bgs = list(zip(ts, ts[1:]))
            hits = [model[b] for b in bgs if b in model]
            ids.append(int(i))
            nb.append(len(bgs))
            ni.append(len(hits))
            sc.append(sum(hits))
        return pd.DataFrame({
            "doc_id": np.array(ids, np.int64),
            "n_bigrams": np.array(nb, np.int64),
            "n_in_model": np.array(ni, np.int64),
            "sum_cond_u": np.array(sc, np.int64)})

    return docs.map_batches(score, batch_format="pandas")


def bigram_lm_score_sql(vocab_size=1024, scale=1 << 20):
    """DuckDB oracle for :func:`bigram_lm_score` (same tokenizer,
    model tiebreak, fixed-point floor ratio, OOV-as-zero)."""
    return f"""
        WITH lt AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+')
                   AS l
          FROM documents),
        bigs AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(l) - 1),
                        i -> l[i] || ' ' || l[i + 1])) AS bg
          FROM lt WHERE len(l) > 1),
        sp AS (SELECT doc_id, split_part(bg, ' ', 1) AS w1,
                      split_part(bg, ' ', 2) AS w2 FROM bigs),
        cnt AS (SELECT w1, w2, count(*) AS c FROM sp GROUP BY 1, 2),
        model AS (SELECT w1, w2, c FROM cnt
                  ORDER BY c DESC, w1, w2 LIMIT {vocab_size}),
        uni AS (
          SELECT u.tok AS w1, count(*) AS cu FROM (
            SELECT unnest(l) AS tok FROM lt) u
          WHERE u.tok IN (SELECT w1 FROM model)
          GROUP BY u.tok),
        rat AS (SELECT m.w1, m.w2, {scale} * m.c // u.cu AS r
                FROM model m JOIN uni u USING (w1)),
        per AS (
          SELECT s.doc_id,
                 CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST(count(r.r) AS BIGINT) AS n_in_model,
                 CAST(coalesce(sum(r.r), 0) AS BIGINT) AS sum_cond_u
          FROM sp s LEFT JOIN rat r
            ON s.w1 = r.w1 AND s.w2 = r.w2
          GROUP BY s.doc_id)
        SELECT d.doc_id,
               CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(coalesce(p.n_in_model, 0) AS BIGINT) AS n_in_model,
               CAST(coalesce(p.sum_cond_u, 0) AS BIGINT) AS sum_cond_u
        FROM documents d LEFT JOIN per p USING (doc_id)"""
