"""Distributed quality-classifier training — the one LLM-curation stage
the corpus pipeline previously imported rather than trained (r6 verdict
item 4).

The model is a batch perceptron over integer document features with
learning rate 1: per round, every currently-misclassified document
contributes ``sign · feature`` to the weight update, and weights stay
exact BIGINTs. No division appears anywhere in the update (Spark ``div``
truncates toward zero while DuckDB ``//`` floors, so NEGATIVE quotients
are the classic cross-engine trap — addition/multiplication of signed
integers is portable), which makes the whole training loop
oracle-unrollable as chained CTEs, the km01/g02 posture.

Scale shape: one narrow map derives features (no shuffle), then each
round is ONE aggregation over the corpus producing a single weight row
that is broadcast back for the next round's margins — per-round cost is
a map + partial-aggregate tree, the cheapest distributed-training shape
there is. Weight magnitude grows at most ``rounds · N · max_feature``
(≈3·10⁹ at 5×10⁵ docs), far inside BIGINT; at 100 TB corpus sizes you
would switch the margin accumulator to DECIMAL(38,0) before BIGINT is
at any risk (headroom ≈ 9·10¹⁸).

The teacher signal is the C4 gate (``text.c4_filters``): the trained
model distills the rule-based gate into a linear scorer, exactly how
production pipelines bootstrap fastText-style quality classifiers from
heuristic labels. Reference scope: hariangr/learn_etl_data_warehouse
has no ML stage (transformer.py:1-63 is cleaning only); this extends
the engine's corpus-curation surface (SURVEY §2 LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import c4_filters, token_count, tokens

# (name, Column-builder) pairs — ordered; "bias" must stay first so the
# oracle SQL and the pure-Python reference agree on feature order.
FEATURE_NAMES = [
    "bias",
    "n_words_capped",
    "mean_word_len_centi",
    "punct_permille",
    "digit_permille",
    "distinct_permille",
]


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
) -> DataFrame:
    """Integer feature vector per document + the C4 teacher label.

    All features are non-negative BIGINTs built with truncating division
    of non-negative operands only (cross-engine exact):

    - ``bias``                 constant 1;
    - ``n_words_capped``       whitespace word count, capped at 1000;
    - ``mean_word_len_centi``  (non-ws chars · 100) div words, cap 2000;
    - ``punct_permille``       (punct chars · 1000) div chars;
    - ``digit_permille``       (digit chars · 1000) div chars;
    - ``distinct_permille``    (distinct tokens · 1000) div words.

    ``label`` is the C4 ``kept`` flag as 0/1; ``sgn`` = 2·label − 1.
    ``min_words`` tunes the teacher's word-count floor — raise it when
    the corpus clears the C4 default everywhere, so training sees BOTH
    classes (a single-class teacher makes the perceptron a trivial
    constant; the driver queries use 40, a ~66/34 split on the
    fixtures at every scale).
    """
    c = F.col(text_col)
    teacher = c4_filters(
        df, text_col=text_col, id_col=id_col, min_words=min_words
    ).select(id_col, F.col("kept").cast("long").alias("label"))
    raw = df.select(
        F.col(id_col),
        token_count(text_col).cast("long").alias("_nw"),
        F.length(F.regexp_replace(c, r"\s", "")).cast("long").alias("_nonws"),
        F.length(c).cast("long").alias("_chars"),
        F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
        .cast("long")
        .alias("_punct"),
        F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("long").alias("_digit"),
        F.size(F.array_distinct(tokens(F.lower(c)))).cast("long").alias("_uniq"),
    )

    def ratio(num: str, den: str, scale: int) -> F.Column:
        return (
            F.when(F.col(den) == 0, F.lit(0))
            .otherwise(F.expr(f"({num} * {scale}) div {den}"))
            .cast("long")
        )

    feats = raw.select(
        id_col,
        F.lit(1).cast("long").alias("bias"),
        F.least(F.col("_nw"), F.lit(1000)).cast("long").alias("n_words_capped"),
        F.least(ratio("_nonws", "_nw", 100), F.lit(2000)).alias(
            "mean_word_len_centi"
        ),
        ratio("_punct", "_chars", 1000).alias("punct_permille"),
        ratio("_digit", "_chars", 1000).alias("digit_permille"),
        ratio("_uniq", "_nw", 1000).alias("distinct_permille"),
    )
    return feats.join(teacher, id_col).withColumn(
        "sgn", (F.col("label") * 2 - 1).cast("long")
    )


def perceptron_train(
    feats: DataFrame,
    rounds: int = 3,
    init: dict[str, int] | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Batch-perceptron training over :func:`quality_features` output.

    Round t (weights start at 0): a document is misclassified when
    ``sgn · margin ≤ 0`` with ``margin = Σ_j w_j·x_j`` (zero margin
    counts — round 1 therefore updates on every document, the standard
    convention); the update is ``w_j += Σ_misclassified sgn·x_j``.
    Pure signed-integer adds/multiplies, so DuckDB unrolls the identical
    rounds (``sum(BIGINT)`` → HUGEINT cast back, the standing trap).

    Returns the weight TRAJECTORY — (rnd, feature, weight) for every
    round 1..``rounds`` — so the driver row pins all intermediate
    states, not just the final vector. One corpus aggregation per round;
    the per-round weight row is collected (6 scalars — bounded driver
    metadata, the km01 centroid posture) and folded into the next
    round's margin expression as literals, keeping each round's plan a
    scan + filter + partial agg with no joins at all.

    ``init`` warm-starts the weight vector (default all-zero) — the
    online-training hook: a streaming sink feeds each micro-batch as a
    1-round continuation of the stored weights
    (``streaming/sinks.py::classifier_train_sink``).

    ``materialize`` localCheckpoints the feature frame once before the
    round loop (the g02/d10 posture): the lazy plan is rooted at the
    corpus scan + six regexp feature extractions + the C4 teacher join,
    so ``rounds`` rounds would otherwise re-scan and re-regex the full
    text ``rounds`` times for a frame of 8 longs/doc (~1000× smaller
    than the text). A/B at sf0.1 (r9, fresh JVM, min-of-3): 12.1 s lazy
    → 3.1 s materialized for the 8-round driver query (cold first-rep
    21.0 → 10.6). Single-round calls skip the checkpoint automatically
    (the write is pure overhead when the frame is read once).
    """
    if rounds < 1:
        raise ValueError("perceptron_train: rounds must be >= 1")
    w = {name: 0 for name in FEATURE_NAMES}
    if init is not None:
        unknown = sorted(set(init) - set(FEATURE_NAMES))
        if unknown:
            raise ValueError(f"perceptron_train: unknown init features {unknown}")
        w.update({k: int(v) for k, v in init.items()})
    spark = feats.sparkSession
    if materialize and int(rounds) > 1:
        feats = feats.localCheckpoint(eager=True)
    out_rows = []
    for rnd in range(1, int(rounds) + 1):
        margin = sum(
            (F.lit(int(w[name])) * F.col(name) for name in FEATURE_NAMES),
            start=F.lit(0).cast("long"),
        )
        mis = feats.filter((F.col("sgn") * margin) <= 0)
        delta = mis.agg(
            *[
                F.coalesce(F.sum(F.col("sgn") * F.col(name)), F.lit(0))
                .cast("long")
                .alias(name)
                for name in FEATURE_NAMES
            ]
        ).first()
        for name in FEATURE_NAMES:
            w[name] = int(w[name]) + int(delta[name])
        out_rows.extend(
            (rnd, name, int(w[name])) for name in FEATURE_NAMES
        )
    return spark.createDataFrame(
        out_rows, "rnd BIGINT, feature STRING, weight BIGINT"
    )


def perceptron_score(
    feats: DataFrame, weights: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Score documents with a trained weight vector (final round of a
    :func:`perceptron_train` trajectory): ``margin = Σ w_j·x_j``,
    ``pred = margin > 0``. The weight table is tiny by construction —
    broadcast onto the corpus, a pure map at scale (this is the fast
    gate the d19/d27-style quality filters consume).
    """
    last = weights.agg(F.max("rnd").alias("_r"))
    wrow = (
        weights.join(F.broadcast(last), weights["rnd"] == last["_r"])
        .groupBy()
        .pivot("feature", FEATURE_NAMES)
        .agg(F.first("weight"))
    )
    joined = feats.crossJoin(F.broadcast(wrow.select(
        *[F.col(n).alias(f"_w_{n}") for n in FEATURE_NAMES]
    )))
    margin = sum(
        (F.col(f"_w_{n}") * F.col(n) for n in FEATURE_NAMES),
        start=F.lit(0).cast("long"),
    )
    return joined.select(
        id_col,
        "label",
        margin.cast("long").alias("margin"),
        (margin > 0).alias("pred"),
    )


def hashed_token_features(
    df: DataFrame,
    buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse hashed bag-of-words features — the fastText-style feature
    map for the WIDE variant of the quality classifier: each lowered
    whitespace token hashes to one of ``buckets`` slots via the repo's
    portable md5-hex idiom (``conv(substr(md5(tok),1,8),16,10) %
    buckets`` ≡ DuckDB ``('0x'||substr(md5(tok),1,8))::BIGINT %``), and
    the doc's feature value is the slot's term count.

    Returns (``id_col``, bucket BIGINT, x BIGINT) — one row per
    (document, occupied slot); empty documents contribute no rows (their
    margin is the empty sum = 0).
    """
    toks = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("_tok").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % F.lit(int(buckets))
    )
    return toks.groupBy(id_col, bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )


def sparse_perceptron_train(
    df: DataFrame,
    buckets: int = 64,
    rounds: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
) -> DataFrame:
    """Batch perceptron over SPARSE hashed token features with the
    weight vector as a DISTRIBUTED TABLE — the wide-model counterpart
    of :func:`perceptron_train` (whose 6 dense weights ride the driver
    as literals; a 2²⁰-slot hashed vocabulary cannot, so margins and
    updates become joins):

    - margins: tf ⋈ weights on bucket → per-doc Σ x·w (one shuffle by
      doc);
    - misclassified: teacher sgn · margin ≤ 0, docs with no live
      buckets default to margin 0 (left join + coalesce);
    - update: tf semi-joined to the misclassified docs, Σ sgn·x per
      bucket (one shuffle by bucket), full-outer merged into the
      weight table.

    Same lr=1 signed-integer arithmetic as the dense form — no division
    anywhere, so the DuckDB oracle unrolls identical rounds as CTE
    join/agg chains. Teacher label is the C4 gate (cl01's posture).
    Per round: two key-equality shuffles, no collect at any width.
    Returns the final weight table (bucket BIGINT, weight BIGINT),
    rows kept even at weight 0 (merge history is part of the state).
    """
    if rounds < 1:
        raise ValueError("sparse_perceptron_train: rounds must be >= 1")
    tf = hashed_token_features(
        df, buckets=buckets, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=True)
    lab = (
        c4_filters(df, text_col=text_col, id_col=id_col, min_words=min_words)
        .select(
            id_col,
            (F.col("kept").cast("long") * 2 - 1).cast("long").alias("sgn"),
        )
        .localCheckpoint(eager=True)
    )
    w = None
    for _ in range(int(rounds)):
        if w is None:
            mis = lab
        else:
            margins = (
                tf.join(w, "bucket")
                .groupBy(id_col)
                .agg(F.sum(F.col("x") * F.col("weight")).alias("_m"))
            )
            mis = (
                lab.join(margins, id_col, "left")
                .filter(
                    F.col("sgn") * F.coalesce(F.col("_m"), F.lit(0)) <= 0
                )
                .select(id_col, "sgn")
            )
        delta = (
            tf.join(mis, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("sgn") * F.col("x")).cast("long").alias("_d"))
        )
        if w is None:
            w = delta.select("bucket", F.col("_d").alias("weight"))
        else:
            w = (
                w.join(delta, "bucket", "full_outer")
                .select(
                    "bucket",
                    (
                        F.coalesce(F.col("weight"), F.lit(0))
                        + F.coalesce(F.col("_d"), F.lit(0))
                    ).cast("long").alias("weight"),
                )
            )
    return w.select("bucket", F.col("weight").cast("long").alias("weight"))


def decision_stump_train(
    feats: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact decision-stump training over the integer feature map: for
    every feature, the accuracy-optimal threshold split against the
    teacher label, integer-exact end to end.

    A stump predicts ``polarity`` when ``value <= threshold`` and
    ``1 - polarity`` otherwise; correctness counts come from one
    cumulative pass over the per-feature VALUE GRID (every feature is a
    bounded permille/centi/cap domain, so the grid is at most ~2k rows
    per feature — the a26/pf04 bounded-grid window posture, partitioned
    by feature). No float impurity: maximizing exact correct-count is
    the same argmax as minimizing misclassification error, and the
    tie-break (correct DESC, threshold ASC, polarity ASC) is a strict
    total order, so the chosen stump is engine-portable.

    Scale shape: one unpivot (narrow), one (feature, value) hash agg,
    windows over the bounded grid, one bounded top-1 per feature.
    Returns (feature, threshold, polarity, correct, n, accuracy_ppm) —
    one row per feature."""
    from pyspark.sql import Window

    stack_args = ", ".join(f"'{n}', {n}" for n in FEATURE_NAMES)
    s = feats.select(
        F.expr(
            f"stack({len(FEATURE_NAMES)}, {stack_args}) AS (feature, value)"
        ),
        "label",
    )
    g = s.groupBy("feature", "value").agg(
        F.count(F.lit(1)).cast("long").alias("n_at"),
        F.coalesce(F.sum("label"), F.lit(0)).cast("long").alias("n1_at"),
    )
    wcum = (
        Window.partitionBy("feature")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("feature")
    c = g.select(
        "feature",
        "value",
        F.sum("n1_at").over(wcum).cast("long").alias("le1"),
        F.sum(F.col("n_at") - F.col("n1_at"))
        .over(wcum)
        .cast("long")
        .alias("le0"),
        F.sum("n1_at").over(wall).cast("long").alias("tot1"),
        F.sum(F.col("n_at") - F.col("n1_at"))
        .over(wall)
        .cast("long")
        .alias("tot0"),
    )
    cand = c.select(
        "feature",
        F.col("value").alias("threshold"),
        F.lit(1).cast("long").alias("polarity"),
        (F.col("le1") + F.col("tot0") - F.col("le0"))
        .cast("long")
        .alias("correct"),
        (F.col("tot1") + F.col("tot0")).cast("long").alias("n"),
    ).unionByName(
        c.select(
            "feature",
            F.col("value").alias("threshold"),
            F.lit(0).cast("long").alias("polarity"),
            (F.col("le0") + F.col("tot1") - F.col("le1"))
            .cast("long")
            .alias("correct"),
            (F.col("tot1") + F.col("tot0")).cast("long").alias("n"),
        )
    )
    wbest = Window.partitionBy("feature").orderBy(
        F.col("correct").desc(), "threshold", "polarity"
    )
    return (
        cand.withColumn("_rn", F.row_number().over(wbest))
        .filter(F.col("_rn") == 1)
        .select(
            "feature",
            "threshold",
            "polarity",
            "correct",
            "n",
            F.expr("(1000000 * correct) div n").cast("long")
            .alias("accuracy_ppm"),
        )
    )


def margin_calibration(scored: DataFrame) -> DataFrame:
    """Calibration / reliability profile of classifier margins: bucket
    by SIGNED decimal digit count (the e19/g15 integer log-bucket —
    scale-robust, since lr=1 perceptron margins grow with corpus size)
    and report how often each margin bucket's documents are actually
    positive. Input is :func:`perceptron_score` output. Integer-exact:
    the bucket is a string-length expression, the rate is truncating
    ppm. Returns (bucket, n, n_pos, pos_rate_ppm, min_margin,
    max_margin)."""
    bucket = (
        F.when(F.col("margin") == 0, F.lit(0))
        .otherwise(
            F.signum("margin").cast("long")
            * F.length(F.abs(F.col("margin")).cast("string"))
        )
        .cast("long")
    )
    return (
        scored.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("label"), F.lit(0))
            .cast("long")
            .alias("n_pos"),
            F.min("margin").cast("long").alias("min_margin"),
            F.max("margin").cast("long").alias("max_margin"),
        )
        .select(
            "bucket",
            "n",
            "n_pos",
            F.expr("(1000000 * n_pos) div n").cast("long")
            .alias("pos_rate_ppm"),
            "min_margin",
            "max_margin",
        )
    )


def stump_cross_validate(
    feats: DataFrame, folds: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """k-fold cross-validated decision stump — the generalization
    report :func:`decision_stump_train` can't give (its accuracy is
    training accuracy; a stump that merely memorizes a grid quirk
    looks identical there). For every fold k: the stump trained on the
    OTHER folds (exact correct-count argmax under the strict
    (correct DESC, feature, threshold, polarity) order, now ranked
    ACROSS features) scored on fold k's held-out rows.

    Fully distributed — no per-fold driver loop: folds come from an
    RNG-free md5 bucket of the id (the d07 split discipline), and the
    fold axis is a GRID DIMENSION — per (feature, value, k) the train
    counts are total − fold-k counts, so one (k, feature)-partitioned
    cumulative pass yields every fold's train AND eval correct-counts
    simultaneously (train grids and eval grids share the union value
    grid, so the chosen threshold always has an exact eval row — no
    as-of join). Windows stay bounded: folds × the per-feature value
    grid (~2k rows), never row count.

    Returns one row per fold: (fold, feature, threshold, polarity,
    n_train, n_eval, train_accuracy_ppm, eval_accuracy_ppm);
    eval ppm is NULL for an empty fold (vanishingly unlikely past toy
    sizes)."""
    from pyspark.sql import Window

    if folds < 2:
        raise ValueError("stump_cross_validate: folds must be >= 2")
    from .sampling import hash_bucket

    fold = hash_bucket(
        F.concat(F.lit("cv:"), F.col(id_col).cast("string")), folds
    )
    stack_args = ", ".join(f"'{n}', {n}" for n in FEATURE_NAMES)
    s = feats.select(
        F.expr(
            f"stack({len(FEATURE_NAMES)}, {stack_args}) AS (feature, value)"
        ),
        "label",
        fold.alias("fold"),
    )
    g = s.groupBy("feature", "value", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_at"),
        F.coalesce(F.sum("label"), F.lit(0)).cast("long").alias("n1_at"),
    )
    tot = g.groupBy("feature", "value").agg(
        F.sum("n_at").cast("long").alias("n_tot"),
        F.sum("n1_at").cast("long").alias("n1_tot"),
    )
    ks = feats.sparkSession.createDataFrame(
        [(k,) for k in range(folds)], "k long"
    )
    gk = g.select(
        F.col("feature").alias("_gf"),
        F.col("value").alias("_gv"),
        F.col("fold").alias("_gk"),
        "n_at",
        "n1_at",
    )
    base = (
        tot.crossJoin(F.broadcast(ks))
        .join(
            gk,
            (F.col("feature") == F.col("_gf"))
            & (F.col("value") == F.col("_gv"))
            & (F.col("k") == F.col("_gk")),
            "left",
        )
        .select(
            "feature",
            "value",
            "k",
            F.coalesce(F.col("n_at"), F.lit(0)).alias("n_ev"),
            F.coalesce(F.col("n1_at"), F.lit(0)).alias("n1_ev"),
            (F.col("n_tot") - F.coalesce(F.col("n_at"), F.lit(0))).alias("n_tr"),
            (F.col("n1_tot") - F.coalesce(F.col("n1_at"), F.lit(0))).alias(
                "n1_tr"
            ),
        )
    )
    wcum = (
        Window.partitionBy("k", "feature")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("k", "feature")
    c = base.select(
        "feature",
        "value",
        "k",
        F.sum("n1_tr").over(wcum).cast("long").alias("le1_tr"),
        F.sum(F.col("n_tr") - F.col("n1_tr")).over(wcum).cast("long").alias("le0_tr"),
        F.sum("n1_tr").over(wall).cast("long").alias("tot1_tr"),
        F.sum(F.col("n_tr") - F.col("n1_tr")).over(wall).cast("long").alias("tot0_tr"),
        F.sum("n1_ev").over(wcum).cast("long").alias("le1_ev"),
        F.sum(F.col("n_ev") - F.col("n1_ev")).over(wcum).cast("long").alias("le0_ev"),
        F.sum("n1_ev").over(wall).cast("long").alias("tot1_ev"),
        F.sum(F.col("n_ev") - F.col("n1_ev")).over(wall).cast("long").alias("tot0_ev"),
    )

    def _cand(pol: int):
        if pol == 1:
            tr = F.col("le1_tr") + F.col("tot0_tr") - F.col("le0_tr")
            ev = F.col("le1_ev") + F.col("tot0_ev") - F.col("le0_ev")
        else:
            tr = F.col("le0_tr") + F.col("tot1_tr") - F.col("le1_tr")
            ev = F.col("le0_ev") + F.col("tot1_ev") - F.col("le1_ev")
        return c.select(
            F.col("k"),
            "feature",
            F.col("value").alias("threshold"),
            F.lit(pol).cast("long").alias("polarity"),
            tr.cast("long").alias("correct_tr"),
            ev.cast("long").alias("correct_ev"),
            (F.col("tot1_tr") + F.col("tot0_tr")).cast("long").alias("n_train"),
            (F.col("tot1_ev") + F.col("tot0_ev")).cast("long").alias("n_eval"),
        )

    cand = _cand(1).unionByName(_cand(0))
    wbest = Window.partitionBy("k").orderBy(
        F.col("correct_tr").desc(), "feature", "threshold", "polarity"
    )
    return (
        cand.withColumn("_rn", F.row_number().over(wbest))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("k").alias("fold"),
            "feature",
            "threshold",
            "polarity",
            "n_train",
            "n_eval",
            F.expr("(1000000 * correct_tr) div n_train")
            .cast("long")
            .alias("train_accuracy_ppm"),
            F.when(
                F.col("n_eval") > 0,
                F.expr("(1000000 * correct_ev) div n_eval"),
            ).cast("long").alias("eval_accuracy_ppm"),
        )
    )


def bernoulli_nb_confusion(
    df: DataFrame,
    label_col: str = "y",
    feature_cols: tuple[str, ...] = ("f1", "f2", "f3", "f4", "f5"),
) -> DataFrame:
    """Bernoulli naive Bayes, trained and scored fully in-engine with
    integer arithmetic (ml09) — the GENERATIVE member of the
    classifier family next to the discriminative perceptrons
    (cl01-cl04), stump (ml04) and OLS (ml07). Train-on-all /
    score-on-all, reported as the (y_true, y_pred) confusion cells
    with within-class shares.

    Determinism design: NB needs no logs when the feature set is
    SMALL — Laplace-smoothed class-conditional probabilities become
    truncating ppm integers  p = ((n_fc + 1)·1e6) div (n_c + 2)
    (each side of the complement computed DIRECTLY — truncated p1 and
    p0 don't sum to 1e6, so deriving one from the other would drift
    from the oracle), and the posterior score is the PRODUCT
    prior · Π p_i in DECIMAL(38,0)/HUGEINT: 1 + |features| factors
    ≤ 1e6 each, so ≤ 6 factors stay under 1e36 — inside decimal-38,
    no float, no libm. More than 7 features would overflow and
    raises. Prediction = larger score, tie → class 0.

    Plan shape: one per-class conditional-sum agg (2 rows), pivoted
    to ONE broadcast stats row, one map-side scoring pass, one cell
    agg — two passes over the corpus, nothing quadratic. A
    single-class corpus trains degenerate priors but never divides
    by zero (Laplace floors every denominator at 2).

    Returns (y_true, y_pred, n_docs, share_ppm) — share within the
    true class, truncating ppm.
    """
    nf = len(feature_cols)
    if nf > 7:
        raise ValueError(
            f"bernoulli_nb_confusion: {nf} features would overflow the"
            " DECIMAL(38,0) score product (max 7)"
        )
    # r14 note: a lazy checkpoint on the 2×-read feature frame was
    # A/B'd and measured a WASH at idle (med 1.37 → 1.51 s at sf0.1)
    # — the regex projection is cheaper than the checkpoint write —
    # so the frame stays lazy (the d03/d13-checkpoint precedent).
    per_class = df.groupBy(F.col(label_col).alias("_c")).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        *[
            F.sum(F.col(f).cast("long")).cast("long").alias(f"_s{i}")
            for i, f in enumerate(feature_cols)
        ],
    )
    aggs = []
    for c in (0, 1):
        aggs.append(
            F.coalesce(
                F.max(F.when(F.col("_c") == c, F.col("_n"))), F.lit(0)
            ).alias(f"_n{c}")
        )
        for i in range(nf):
            aggs.append(
                F.coalesce(
                    F.max(F.when(F.col("_c") == c, F.col(f"_s{i}"))),
                    F.lit(0),
                ).alias(f"_s{i}_{c}")
            )
    stats = per_class.agg(*aggs)

    def _score(c: int) -> str:
        terms = [
            f"CAST(((_n{c} + 1) * 1000000)"
            f" div (_n0 + _n1 + 2) AS DECIMAL(38,0))"
        ]
        for i, f in enumerate(feature_cols):
            terms.append(
                f"(CASE WHEN {f} = 1"
                f" THEN ((_s{i}_{c} + 1) * 1000000) div (_n{c} + 2)"
                f" ELSE ((_n{c} - _s{i}_{c} + 1) * 1000000)"
                f" div (_n{c} + 2) END)"
            )
        return " * ".join(terms)

    scored = (
        df.crossJoin(F.broadcast(stats))
        .select(
            F.col(label_col).cast("long").alias("y_true"),
            F.expr(
                f"CASE WHEN ({_score(1)}) > ({_score(0)})"
                " THEN 1 ELSE 0 END"
            ).cast("long").alias("y_pred"),
        )
    )
    cells = scored.groupBy("y_true", "y_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = cells.groupBy("y_true").agg(F.sum("n_docs").alias("_t"))
    return cells.join(tot, "y_true").select(
        "y_true",
        "y_pred",
        "n_docs",
        F.expr("(1000000 * n_docs) div _t").cast("long").alias("share_ppm"),
    )
