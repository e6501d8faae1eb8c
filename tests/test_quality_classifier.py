"""Round-9 curation additions: the hashed-feature Naive-Bayes quality
classifier (the DCLM/fastText seed-classifier pattern) and the
per-source KL mixture diagnostic.  Value parity vs DuckDB is covered
by the all-queries oracle sweep; this module pins the SCALE
properties (bounded broadcast sides, zero windows, JVM-side only) and
the model semantics the sweep's hash can't explain on its own."""

from durablestreams_spark.analytics.core import all_queries
from durablestreams_spark.operators import text as T
from durablestreams_spark.plans import formatted_plan, has_python_eval

SF_DIR = "/root/testdata/sf0.001"


def test_nb_weight_table_is_bucket_bounded(spark):
    """The scoring join's broadcast side is the learned per-bucket
    llr table: its cardinality must be <= NB_BUCKETS (a CONSTANT) —
    the hashing trick is the entire reason the learned model
    broadcasts at 100 TB where a raw-vocabulary weight vector would
    not.  The whole learn+apply must stay JVM-side with zero windows
    (labels are row-local projections on the same row as the token
    array, so there is no label join to shuffle)."""
    df = all_queries()["text_quality_classifier_nb"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert not has_python_eval(df), "NB classifier must stay JVM-side"


def test_nb_classifier_separates_seed_labels(spark):
    """Trained on the Gopher seed labels, the classifier must actually
    separate them: mean logit over positive-labeled docs strictly
    above mean logit over negative-labeled docs, and the thresholded
    prediction must agree with the seed label on a clear majority of
    documents (the classifier generalizes the rules, it does not
    memorize doc ids — hashed bag-of-words can't encode identity)."""
    rows = (
        all_queries()["text_quality_classifier_nb"].fn(spark, SF_DIR).collect()
    )
    pos = [r.nb_logit for r in rows if r.gopher_keep]
    neg = [r.nb_logit for r in rows if not r.gopher_keep]
    assert pos and neg, "fixture must carry both seed classes"
    assert sum(pos) / len(pos) > sum(neg) / len(neg)
    agree = sum(1 for r in rows if bool(r.pred_keep) == bool(r.gopher_keep))
    assert agree / len(rows) > 0.6, f"only {agree}/{len(rows)} agree"


def test_nb_prediction_uses_rounded_logit(spark):
    """pred_keep must be derivable from the ROUNDED logit alone —
    the 1e-4-grid boundary both engines agree on — for every row."""
    rows = (
        all_queries()["text_quality_classifier_nb"].fn(spark, SF_DIR).collect()
    )
    assert all(bool(r.pred_keep) == (r.nb_logit > 0) for r in rows)


def test_source_kl_is_bounded_and_window_free(spark):
    """After the one partial-aggregated corpus pass the per-source
    count grid is O(#sources x (VOCAB+1)) rows; nothing downstream
    may be a window or a Python eval.  Output: exactly one row per
    distinct source, each KL >= 0 (both smoothed distributions are
    normalized over the same support, so Gibbs' inequality holds; the
    1e-6 rounding can only graze zero, never go meaningfully
    negative)."""
    df = all_queries()["sample_source_kl"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Window" not in plan, plan
    assert not has_python_eval(df)
    rows = df.collect()
    n_sources = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources
    assert all(r.kl_nats >= -1e-6 for r in rows)
    assert all(r.n_tokens > 0 for r in rows)


def test_gopher_metrics_shared_by_rules_and_classifier(spark):
    """The classifier's seed label must equal the curate-threshold
    combination of text_gopher_rules' own flags doc-by-doc — one
    metric definition, two consumers (the drift guard that makes the
    refactor safe)."""
    qs = all_queries()
    flags = {
        r.doc_id: (
            r.ok_word_count
            and r.ok_mean_word_len
            and r.ok_alpha
            and r.ok_symbols
            and r.n_stopwords >= T.CURATE_MIN_STOPWORDS
        )
        for r in qs["text_gopher_rules"].fn(spark, SF_DIR).collect()
    }
    nb = qs["text_quality_classifier_nb"].fn(spark, SF_DIR).collect()
    assert all(bool(r.gopher_keep) == bool(flags[r.doc_id]) for r in nb)


def test_datasheet_matches_standalone_operators(spark):
    """audit_corpus_datasheet is a COMPOSITION: its per-source Gopher
    pass rate and duplicate rate must equal what the standalone graded
    operators report, aggregated by hand — the drift guard for the
    shared definitions."""
    import math
    from collections import defaultdict

    qs = all_queries()
    df = qs["audit_corpus_datasheet"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Window" not in plan, plan
    assert not has_python_eval(df)
    sheet = {r.source: r for r in df.collect()}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    assert len(sheet) == len(set(src.values()))

    keep = {
        r.doc_id: (
            r.ok_word_count
            and r.ok_mean_word_len
            and r.ok_alpha
            and r.ok_symbols
            and r.n_stopwords >= T.CURATE_MIN_STOPWORDS
        )
        for r in qs["text_gopher_rules"].fn(spark, SF_DIR).collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for did, s in src.items():
        agg[s][0] += 1
        agg[s][1] += 1 if keep[did] else 0
    keep_rates = set()
    for s, (n, k) in agg.items():
        assert sheet[s].n_docs == n
        want = math.floor(k / n * 10000 + 0.5) / 10000
        assert sheet[s].curate_keep_rate == want, (s, k, n)
        keep_rates.add(want)
    assert len(keep_rates) > 1, "curate gate must discriminate on fixture"
    assert all(0.0 <= r.exact_dup_rate <= 1.0 for r in sheet.values())
    assert all(r.sum_tokens > 0 for r in sheet.values())


def test_bpe_fertility_bounds_and_composition(spark):
    """Fertility is tokens-per-word under the learned merges: every
    word yields >= 1 token, every token covers >= 1 char, so
    fertility >= 1 and tokens_per_char <= 1 per language; the rollup
    must equal text_bpe_tokenize's per-doc counts aggregated by hand
    (one shared apply definition, two graded consumers)."""
    import math
    from collections import defaultdict

    qs = all_queries()
    rows = qs["text_bpe_fertility"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(r.fertility >= 1.0 for r in rows)
    assert all(0.0 < r.tokens_per_char <= 1.0 for r in rows)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lang = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    per = defaultdict(lambda: [0, 0])
    for r in qs["text_bpe_tokenize"].fn(spark, SF_DIR).collect():
        if r.n_words > 0:
            per[lang[r.doc_id]][0] += r.n_words
            per[lang[r.doc_id]][1] += r.n_bpe_tokens
    for r in rows:
        w, t = per[r.lang]
        assert r.sum_words == w and r.sum_bpe_tokens == t
        assert r.fertility == math.floor(t / w * 10000 + 0.5) / 10000


def test_classifier_topk_selects_per_source_terciles(spark):
    """The DCLM selection step: per source, exactly the docs whose
    shared NB logit strictly exceeds the floor-snapped exact 2/3
    percentile are kept — verified by recomputing the interpolated
    percentile by hand from the classifier's own graded output.
    Window-free (the boundary pattern), JVM-side."""
    import math
    from collections import defaultdict

    qs = all_queries()
    df = qs["sample_classifier_topk"].fn(spark, SF_DIR)
    assert "Window" not in formatted_plan(df)
    assert not has_python_eval(df)
    kept = df.collect()
    assert kept

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    scores = defaultdict(list)
    for r in qs["text_quality_classifier_nb"].fn(spark, SF_DIR).collect():
        scores[src[r.doc_id]].append((r.doc_id, r.nb_logit))

    for s, pairs in scores.items():
        vals = sorted(v for _, v in pairs)
        rank = (len(vals) - 1) * 2.0 / 3
        lo, frac = int(math.floor(rank)), rank - math.floor(rank)
        q = vals[lo] + frac * (vals[min(lo + 1, len(vals) - 1)] - vals[lo])
        cut = math.floor(q * 10000 + 0.5) / 10000
        want = {d for d, v in pairs if v > cut}
        got = {r.doc_id for r in kept if r.source == s}
        assert got == want, (s, cut, len(got), len(want))
        for r in kept:
            if r.source == s:
                assert r.cut == cut


def test_streaming_scorer_matches_batch_model(spark):
    """Train-offline/score-online parity: the streaming scorer's
    drained output must equal the batch classifier's (doc_id,
    n_feats, nb_logit) triples exactly — one trained model, folded
    into a stateless streaming projection.  The streaming plan must
    carry NO state: no watermark, no stateful operator, no
    stream-side join (the map literal is vocabulary state inside the
    projection)."""
    qs = all_queries()
    batch = {
        r.doc_id: (r.n_feats, r.nb_logit)
        for r in qs["text_quality_classifier_nb"].fn(spark, SF_DIR).collect()
    }
    live = qs["streaming_quality_score"].fn(spark, SF_DIR).collect()
    assert len(live) == len(batch)
    for r in live:
        assert (r.n_feats, r.nb_logit) == batch[r.doc_id], r.doc_id


def test_curate_v3_composition_matches_hand_rollup(spark):
    """pipeline_curate_v3's datasheet must equal the hand-composed
    stages run from the standalone graded outputs: NB scores ->
    per-source 1/3-percentile cut (strict >) -> min-id dedup by
    content md5 -> md5 split -> (split, source) doc/token rollup."""
    import hashlib
    import math
    from collections import defaultdict

    qs = all_queries()
    nb = {r.doc_id: r.nb_logit
          for r in qs["text_quality_classifier_nb"].fn(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    meta = {r.doc_id: r for r in docs}

    by_src = defaultdict(list)
    for did, v in nb.items():
        by_src[meta[did].source].append(v)
    cut = {}
    for s, vals in by_src.items():
        vals.sort()
        rank = (len(vals) - 1) / 3.0
        lo, frac = int(math.floor(rank)), rank - math.floor(rank)
        q = vals[lo] + frac * (vals[min(lo + 1, len(vals) - 1)] - vals[lo])
        cut[s] = math.floor(q * 10000 + 0.5) / 10000
    kept = [did for did, v in nb.items() if v > cut[meta[did].source]]
    canon = {}
    for did in sorted(kept):
        h = hashlib.md5(meta[did].text.encode()).hexdigest()
        canon.setdefault(h, did)
    want = defaultdict(lambda: [0, 0])
    for did in canon.values():
        h2 = hashlib.md5(f"{did}:split".encode()).hexdigest()[:2]
        split = "train" if h2 < "cc" else ("valid" if h2 < "e6" else "test")
        n_words = len([t for t in __import__("re").split(r"\s+", meta[did].text) if t])
        want[(split, meta[did].source)][0] += 1
        want[(split, meta[did].source)][1] += n_words
    df = qs["pipeline_curate_v3"].fn(spark, SF_DIR)
    # exactly ONE Window operator in the whole composed plan: the
    # row_number over the 16-byte content digest (key-partitioned
    # dedup) — the classifier gate itself is window-free boundary
    # classification.  (WindowGroupLimit nodes are the rank-limit
    # pushdown of that same window, not extra sorts.)
    import re

    assert len(re.findall(r"\bWindow \(\d+\)", formatted_plan(df))) == 1
    got = {(r.split, r.source): (r.n_docs, r.sum_tokens)
           for r in df.collect()}
    assert got == {k: tuple(v) for k, v in want.items()}


def test_nb_model_cache_cold_warm_parity(spark, tmp_path):
    """The persisted NB model must serve the same scores cold
    (training inline, writing the cache) and warm (reading it), and a
    fixture fingerprint change must invalidate the marker — the
    cache_marker doctrine applied to the model store."""
    import os
    import shutil

    from durablestreams_spark.operators.cache_marker import marker_current

    root = os.path.join(
        "/tmp/durablestreams_nbmodel_v1",
        os.path.basename(os.path.normpath(SF_DIR)),
    )
    shutil.rmtree(root, ignore_errors=True)
    qs = all_queries()
    cold = {
        r.doc_id: r.nb_logit
        for r in qs["streaming_quality_score"].fn(spark, SF_DIR).collect()
    }
    assert os.path.exists(os.path.join(root, "model.json"))
    warm = {
        r.doc_id: r.nb_logit
        for r in qs["streaming_quality_score"].fn(spark, SF_DIR).collect()
    }
    assert cold == warm
    # a different fixture dir (different fingerprint) must not reuse
    # this marker
    assert not marker_current(
        os.path.join(root, "_built"),
        "/root/testdata/sf0.01",
        name="documents",
        params="nb1024:uni+bi:curate-stop1:v1",
    )


def test_quality_resample_is_weighted_sample_not_rank(spark):
    """Gumbel-top-k must differ from plain rank-by-logit (otherwise
    it silently degenerated into the hard cut), every key must equal
    logit + Gumbel(md5-uniform) recomputed by hand, and the plan must
    be TakeOrdered (no window, no global sort)."""
    import hashlib
    import math

    qs = all_queries()
    df = qs["sample_quality_resample"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan
    rows = df.collect()
    assert 0 < len(rows) <= 50
    nb = {r.doc_id: r.nb_logit
          for r in qs["text_quality_classifier_nb"].fn(spark, SF_DIR).collect()}
    for r in rows:
        h = int(hashlib.md5(f"{r.doc_id}:nbsel".encode()).hexdigest()[:8], 16)
        gum = -math.log(-math.log((h + 0.5) / 4294967296.0))
        assert abs(r.gumbel_key - (nb[r.doc_id] + gum)) < 1e-4
    top_rank = set(sorted(nb, key=lambda d: (-nb[d], d))[: len(rows)])
    assert {r.doc_id for r in rows} != top_rank, "degenerated into rank"


def test_streaming_monitor_matches_batch_rollup(spark):
    """The LIVE quality monitor's per-source rows must equal a
    hand-rollup of the batch classifier's graded output (shared
    labels + shared served logits), with the decimal-exact floor-form
    mean — and its streaming state is keyed by source (bounded), not
    by doc."""
    import math
    from collections import defaultdict

    qs = all_queries()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    agg = defaultdict(lambda: [0, 0, 0.0])
    for r in qs["text_quality_classifier_nb"].fn(spark, SF_DIR).collect():
        a = agg[src[r.doc_id]]
        a[0] += 1
        a[1] += 1 if r.gopher_keep else 0
        a[2] += r.nb_logit
    rows = qs["streaming_quality_monitor"].fn(spark, SF_DIR).collect()
    assert len(rows) == len(agg)
    for r in rows:
        n, k, s = agg[r.source]
        assert (r.n_docs, r.n_keep) == (n, k)
        want = math.floor(s / n * 10000 + 0.5) / 10000
        assert abs(r.mean_logit - want) < 1e-9, (r.source, r.mean_logit, want)


def test_fixture_stopword_ceiling_pins_curate_threshold(spark):
    """The documented justification for CURATE_MIN_STOPWORDS=1,
    pinned as evidence: EVERY document in the driver-generated fixture
    carries at most ONE distinct word of the eight-entry Gopher
    lexicon (measured here, not asserted in prose), so the published
    >= 2-distinct-stopwords rule (GOPHER_MIN_STOPWORDS, which
    text_gopher_rules reports per doc) would zero the corpus and
    degenerate every downstream consumer, including the NB seed
    labels.  The fixture is outside the builder's write boundary
    (/root/testdata is driver-owned, read-only), so the gate runs the
    full five-rule structure at the fixture-viable threshold; if the
    driver ever regenerates the corpus with natural stopword
    frequencies, THIS TEST FAILS — the signal to flip the constant
    back to the published value."""
    from pyspark.sql import functions as F

    import durablestreams_spark.operators.text as T

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lex = F.array(*[F.lit(s) for s in T.GOPHER_STOPWORDS])
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
            ),
            lex,
        )
    )
    dist = {
        r.n_stop: r.n
        for r in docs.select(n_stop.alias("n_stop"))
        .groupBy("n_stop")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert max(dist) <= 1, (
        f"fixture now carries docs with {max(dist)} distinct stopwords - "
        "raise CURATE_MIN_STOPWORDS to GOPHER_MIN_STOPWORDS "
        f"(distribution: {dist})"
    )
    # and the threshold-1 rule is genuinely discriminative: both
    # classes are populated
    assert dist.get(0, 0) > 0 and dist.get(1, 0) > 0, dist


def test_streaming_ingest_gate_matches_batch_composition(spark):
    """The LIVE gate's per-doc decisions must equal the hand-composed
    batch signals: exact_dup from a min-id-by-content-md5 fold,
    gopher_keep + logit from the batch classifier, keep = the AND of
    the three — one set of shared definitions, online and offline."""
    import hashlib

    qs = all_queries()
    nb = {
        r.doc_id: (r.gopher_keep, r.nb_logit)
        for r in qs["text_quality_classifier_nb"].fn(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    first = {}
    for d in sorted(docs, key=lambda r: r.doc_id):
        h = hashlib.md5(d.text.encode()).hexdigest()
        first.setdefault(h, d.doc_id)
    dup = {
        d.doc_id: first[hashlib.md5(d.text.encode()).hexdigest()] < d.doc_id
        for d in docs
    }
    live = qs["streaming_ingest_gate"].fn(spark, SF_DIR).collect()
    assert len(live) == len(nb)
    for r in live:
        gk, logit = nb[r.doc_id]
        assert r.exact_dup == dup[r.doc_id], r.doc_id
        assert (r.gopher_keep, r.nb_logit) == (gk, logit), r.doc_id
        assert r.keep == ((not r.exact_dup) and gk and logit > 0), r.doc_id


def test_nb_serving_exactness(spark):
    """The Arrow serving path (r15: fixed-point int64 accumulation in
    a vectorized pandas UDF) must be BIT-IDENTICAL to the decimal
    HOF fold it replaced, over the full fixture corpus — the
    equality that lets every streaming consumer keep its oracle
    hash.  The reference fold is inlined here verbatim so the pin
    survives any future serving-path change."""
    from pyspark.sql import functions as F

    from durablestreams_spark.analytics.core import spread, table
    from durablestreams_spark.operators.streaming_queries import (
        _nb_logit_col,
        _nb_serving_model,
    )
    from durablestreams_spark.operators.text import (
        NB_BUCKETS,
        _gopher_metrics,
        _nb_bucket,
        _nb_feats_array,
    )

    lam, pri = _nb_serving_model(spark, SF_DIR)
    docs = spread(table(spark, SF_DIR, "documents"))
    m = _gopher_metrics(docs, keep_words=True)
    feats = m.select(
        "doc_id", _nb_feats_array(F.col("wrds")).alias("feats")
    ).where(F.size("feats") > 0)

    # the pre-r15 decimal fold, verbatim
    lam_arr = F.array(*[F.lit(lam.get(b, 0.0)) for b in range(NB_BUCKETS)])
    dec = "decimal(28,18)"
    ref = F.round(
        F.lit(float(pri)).cast(dec)
        + F.aggregate(
            F.transform(
                F.col("feats"),
                lambda t: F.element_at(
                    lam_arr, (_nb_bucket(t) + 1).cast("int")
                ),
            ),
            F.lit(0).cast(dec),
            lambda a, x: (a + x.cast(dec)).cast(dec),
        ),
        4,
    ).cast("double")

    both = feats.select(
        "doc_id",
        ref.alias("want"),
        _nb_logit_col(F.col("feats"), lam, pri).alias("got"),
    )
    rows = both.collect()
    assert rows, "fixture corpus must score at least one doc"
    for r in rows:
        assert r.got == r.want, (r.doc_id, r.got, r.want)


def test_nb_fixed_model_matches_spark_cast(spark):
    """The fixed-point quantization in _nb_logit_fixed_model must
    agree with Spark's CAST(double AS DECIMAL(28,18)) — which
    quantizes the SHORTEST decimal repr (Double.toString), not the
    double's exact binary expansion (r16 fix of the r15 ADVICE high
    item: e.g. 2.302585092994046 casts to ...046000000 in Spark but
    Decimal(float) expands to ...045901...).  Adversarial values
    chosen so the two quantizations differ at the 1e-18 grid."""
    from decimal import Decimal

    from durablestreams_spark.operators.streaming_queries import (
        _nb_logit_fixed_model,
    )
    from durablestreams_spark.operators.text import NB_BUCKETS

    vals = [
        2.302585092994046,   # ln(10): binary expansion ends ...045901
        -2.302585092994046,
        0.1,                 # classic non-terminating binary fraction
        -0.3,
        1e-19,               # rounds to 0 at 18 dp either way
        4.605170185988091,
        0.0001,
        -7.477304223594182,
    ]
    lam = {b: vals[b % len(vals)] for b in range(NB_BUCKETS)}
    pri = vals[0]
    hi, lo, pri_fixed = _nb_logit_fixed_model(lam, pri)

    df = spark.createDataFrame(
        [(b, float(lam[b])) for b in range(len(vals))], "b int, v double"
    ).selectExpr("b", "CAST(CAST(v AS DECIMAL(28,18)) AS STRING) AS s")
    for r in df.collect():
        want = int(Decimal(r.s).scaleb(18))
        got = int(hi[r.b]) * 10**9 + int(lo[r.b])
        assert got == want, (r.b, got, want)
    assert pri_fixed == int(hi[0]) * 10**9 + int(lo[0])
