"""Trained document-quality classifier: logistic regression over
feature-hashed text vectors.

The published pipeline pattern (GPT-3's WebText-vs-CommonCrawl quality
filter, Brown et al. 2020 App. A; LLaMA's Wikipedia-reference
classifier; CCNet's fastText step): train a cheap linear classifier
whose positive class is a trusted corpus, score every candidate page,
keep by score (possibly with pareto-stochastic thresholding — the
caller's choice; the score column is the product here).

Spark shape:

* **features** — ``functions.text.hashed_embedding`` (hashing trick):
  zero shuffle, no vocabulary to ship. Fit and scoring default to the
  O(tokens) Arrow kernel (``hashed_embedding_batch``, bit-identical to
  the pure-Catalyst expression form, which remains available via
  ``impl='expr'`` for SQL-only plans).
* **fit** — MLlib ``LogisticRegression`` on a bounded sample (the
  IvfIndex.fit contract: constant cost regardless of corpus size).
  The fitted coefficients are a plain (dim,)+1 float list — persist
  them like the IVF centers / PQ codebooks.
* **score** — ``sigmoid(w·v + b)`` as a LEFT-TO-RIGHT fold over the
  hashed vector with the coefficients as literals, zero shuffle; the
  default vector producer is the Arrow kernel, and a SQL oracle
  replays the identical values (the center-literal trick).

The reference has no classifier surface (vector search only); this is
a north-star training-data-pipeline operator.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from syzgydb_spark.functions.text import hashed_embedding, hashed_embedding_batch
from syzgydb_spark.functions.vector import dot_product


@dataclass
class QualityClassifier:
    """Fitted coefficients for the hashed-feature logistic model.
    ``weights`` has length ``dim`` (one per hash bucket); the feature
    extraction is fully determined by (dim, seed, normalize, hash_fn)
    — hash_fn persists with the model because scores from one hash
    family are meaningless against features of the other."""

    weights: list[float] = field(default_factory=list)
    bias: float = 0.0
    dim: int = 256
    seed: int = 42
    normalize: bool = True
    hash_fn: str = "md5"

    def to_dict(self) -> dict:
        return {
            "weights": [float(w) for w in self.weights],
            "bias": float(self.bias),
            "dim": int(self.dim),
            "seed": int(self.seed),
            "normalize": bool(self.normalize),
            "hash_fn": str(self.hash_fn),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "QualityClassifier":
        return cls(
            weights=[float(w) for w in d["weights"]],
            bias=float(d["bias"]),
            dim=int(d["dim"]),
            seed=int(d.get("seed", 42)),
            normalize=bool(d.get("normalize", True)),
            hash_fn=str(d.get("hash_fn", "md5")),
        )

    # ---- scoring ----
    def score_expr(self, text: Column | str, *, impl: str = "arrow") -> Column:
        """``sigmoid(w·hashed(text) + b)``. The dot product folds LEFT
        TO RIGHT over the fixed dim order (weights are literals), so
        any SQL engine reproduces the double bit-for-bit before the
        final exp.

        ``impl='arrow'`` (default) builds the hashed vector with the
        O(tokens) Arrow kernel — bit-identical to the expression form
        (hashed_embedding_batch's parity contract) but ~dim× cheaper;
        'expr' keeps the vector pure Catalyst for plans that must stay
        SQL-only."""
        if impl not in ("arrow", "expr"):
            # a silent fallback would reinstate the O(dim x tokens)
            # fold with bit-identical results — nothing would ever
            # surface the ~26x slowdown
            raise ValueError(f"impl must be 'arrow' or 'expr', got {impl!r}")
        if len(self.weights) != self.dim:
            # a mismatched model would silently NULL every score (the
            # zip pads the shorter side) — fail fast instead
            raise ValueError(
                f"classifier has {len(self.weights)} weights for dim={self.dim}"
            )
        embed = hashed_embedding_batch if impl == "arrow" else hashed_embedding
        v = embed(
            text, self.dim, seed=self.seed, normalize=self.normalize,
            hash_fn=self.hash_fn,
        )
        w = F.array(*[F.lit(float(x)) for x in self.weights])
        z = dot_product(w, v) + F.lit(float(self.bias))
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def fit_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    *,
    dim: int = 256,
    seed: int = 42,
    normalize: bool = True,
    hash_fn: str = "md5",
    max_sample: int = 100_000,
    sample_fractions: tuple[float, float] | None = None,
    reg_param: float = 0.01,
    max_iter: int = 50,
    impl: str = "arrow",
) -> QualityClassifier:
    """Fit the quality model: ``positive`` is the trusted corpus (label
    1), ``negative`` the candidate/background corpus (label 0); both
    are bounded-sampled, feature-hashed, and fed to MLlib
    LogisticRegression. The distributed cost is two sampled scans +
    one bounded fit, plus one count() per corpus to derive the sample
    rate — pass ``sample_fractions=(pos, neg)`` to skip the counts
    when the sizes are known (then the cost is truly independent of
    corpus size, like IvfIndex.fit). NULL-text rows are excluded
    (they score NULL and cannot be featurized for the fit).
    Returns the coefficients; persist with ``to_dict`` so scoring (and
    its oracle) never needs the fit again. ``impl`` selects the hashed
    feature producer exactly as in ``score_expr`` ('arrow' default,
    'expr' for executors without pandas/pyarrow)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    if impl not in ("arrow", "expr"):
        raise ValueError(f"impl must be 'arrow' or 'expr', got {impl!r}")
    embed = hashed_embedding_batch if impl == "arrow" else hashed_embedding

    def prep(df: DataFrame, label: int, fraction: float | None) -> DataFrame:
        # NULL text scores NULL but cannot be fit on (array_to_vector
        # rejects NULL features) — drop it up front
        s = df.where(F.col(text_col).isNotNull()).select(
            F.col(text_col).alias("_t")
        )
        if fraction is None:
            # the exact count costs one extra scan per corpus; pass
            # sample_fractions to skip it when the sizes are known.
            # Count the FILTERED frame — it is what gets sampled, and
            # deriving the rate from the raw count would undersize the
            # sample whenever NULL-text rows are common
            n = s.count()
            fraction = max_sample / n if n > max_sample else 1.0
        if fraction < 1.0:
            s = s.sample(fraction, seed=seed)
        return s.select(
            array_to_vector(
                # Arrow kernel default: O(tokens) per doc; the
                # expression form's O(dim x tokens) fold made large
                # fits CPU-bound on the hashing
                embed("_t", dim, seed=seed, normalize=normalize,
                      hash_fn=hash_fn)
            ).alias("features"),
            F.lit(float(label)).alias("label"),
        )

    # materialize the hashed features ONCE: LBFGS iterates over the
    # input, and without the persist every iteration re-evaluates the
    # full hashing expression lineage
    fr_pos, fr_neg = sample_fractions or (None, None)
    train = (
        prep(positive, 1, fr_pos).unionAll(prep(negative, 0, fr_neg)).persist()
    )
    try:
        train.count()
        lr = LogisticRegression(
            maxIter=max_iter, regParam=reg_param, standardization=False
        )
        model = lr.fit(train)
    finally:
        train.unpersist()
    coef = model.coefficients
    arr = coef.toArray() if hasattr(coef, "toArray") else list(coef)
    return QualityClassifier(
        weights=[float(x) for x in arr],
        bias=float(model.intercept),
        dim=dim,
        seed=seed,
        normalize=normalize,
        hash_fn=hash_fn,
    )


def score_quality(
    df: DataFrame,
    clf: QualityClassifier,
    text_col: str = "text",
    *,
    out_col: str = "quality_score",
    decimals: int | None = 6,
    impl: str = "arrow",
) -> DataFrame:
    """Input rows + the model's P(trusted | text) — a zero-shuffle
    projection. ``decimals`` rounds the score (engine-portable output;
    pass None for the raw double); ``impl`` as in ``score_expr``."""
    s = clf.score_expr(text_col, impl=impl)
    if decimals is not None:
        s = F.round(s, decimals)
    return df.withColumn(out_col, s)
