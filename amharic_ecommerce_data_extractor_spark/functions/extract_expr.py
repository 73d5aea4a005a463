"""Entity extraction as PURE JVM column expressions — zero Python anywhere.

The same semantics as ``kernels.labeler`` (message tokenizer + BIO rule
automaton + entity grouping + price parsing), compiled into Spark
higher-order array functions. Parity with the Python kernel is pinned
token-for-token by tests on the full synthetic corpus.

Role (measured, round 3): this is the SEMANTICS TWIN and the
no-Python-runtime fallback, NOT the speed path. Higher-order-function
lambdas (transform/aggregate/filter) are interpreted per element — they sit
outside whole-stage codegen — and at 32-way parallelism on a 500k-message
corpus the fused extract→triples job measures ~4× SLOWER than the
Arrow-batched pandas-UDF backend (40.6 s vs 9.8 s). The pandas ``rules``
backend is the production default; use this path where executors cannot run
Python workers, for cross-checking the kernel, or as the template for a
future codegen'd native function.

How the sequential automaton becomes data-parallel expressions:
1. tokenizer: regexp_extract_all + per-token conditional sub-splitting
   (transform → flatten).
2. per-token flags (is_num / gazetteer / phone / descriptors): one boolean
   array per rule via transform.
3. greedy runs: a REVERSE fold precomputes, for every index, where its
   location/product run would end — turning the kernel's inner while-loops
   into array lookups.
4. the main rule dispatch: a single LEFT fold over token indices carrying
   (skip_until, labels) state — lookahead is element_at on the precomputed
   arrays.
5. entity grouping: run-start/run-break boolean algebra + slice/array_join
   (no fold needed).

One deliberate omission: the kernel's Rule 1b (digits and 'ብር' glued in ONE
token) is provably unreachable after the message tokenizer — any \\w+ token
containing 'ብር' with length > 2 is split into a digit-free head + 'ብር', and
the only surviving token containing 'ብር' is the bare 'ብር' itself (no digit).
The parity tests exercise exactly the fused tokenizer+labeler path and
confirm equality.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

from ..kernels import labeler as lb

# ---------------------------------------------------------------------------
# literal gazetteers (lit arrays built once per query)
# ---------------------------------------------------------------------------

_LOC_KW_PATTERN = "|".join(re.escape(k) for k in lb.LOCATION_KEYWORDS)
_PHONE_PATTERN = r"^(\+?2519\d{8}|09\d{8})$"
_NUM_PATTERN = r"^\d[\d,\.]*$"

_PROD_SET = sorted(lb.ENGLISH_PRODUCT_INDICATORS | lb.AMHARIC_PRODUCT_INDICATORS)
_DESC_SET = sorted(lb.PRODUCT_DESCRIPTORS)
_LOC_CTX_SET = sorted(lb.LOCATION_CONTEXT_WORDS)
_TRIGGER_SET = sorted(lb.PRICE_TRIGGERS)


def _lit_arr(values):
    return F.array(*[F.lit(v) for v in values])


# ---------------------------------------------------------------------------
# tokenizer (kernels.labeler.tokenize_message semantics)
# ---------------------------------------------------------------------------

def tokenize_message_expr(col) -> Column:
    pre = F.translate(col, "፦•", ":")
    raw = F.regexp_extract_all(pre, F.lit(r"(?U)\b\w+\b|[.,;!?#@%/:-]"), 0)

    def subsplit(t):
        low = F.lower(t)
        # case A: token glues 'ብር' (len > 2): head (if any) + 'ብር'; tail dropped
        head = F.substring_index(t, "ብር", 1)
        case_a = F.when(head != "", F.array(head, F.lit("ብር"))).otherwise(F.array(F.lit("ብር")))
        # case B: 'ዋጋ' with ':' → split on [:\-]; parts[0] + non-empty rest
        parts_b = F.split(t, r"[:\-]", -1)
        case_b = F.concat(
            F.slice(parts_b, 1, 1),
            F.filter(F.slice(parts_b, 2, F.greatest(F.size(parts_b) - 1, F.lit(0))),
                     lambda p: p != ""),
        )
        # case C: dimension 'x' tokens → parts[0], 'x', parts[1] if non-empty
        parts_c = F.split(t, "x", -1)
        no_x = F.regexp_replace(t, "x", "")
        case_c = F.concat(
            F.slice(parts_c, 1, 1), F.array(F.lit("x")),
            F.filter(F.slice(parts_c, 2, 1), lambda p: p != ""),
        )
        return (
            F.when(t.contains("ብር") & (F.length(t) > 2), case_a)
            .when(t.contains("ዋጋ") & t.contains(":"), case_b)
            .when(t.contains("x") & (no_x.rlike(r"^\d+$") | no_x.rlike(r"\p{L}")), case_c)
            .otherwise(F.array(t))
        )

    flat = F.flatten(F.transform(raw, subsplit))
    return F.filter(flat, lambda x: F.trim(x) != "")


# ---------------------------------------------------------------------------
# BIO labeling (kernels.labeler.label_tokens semantics)
# ---------------------------------------------------------------------------

def _idx_seq(n: Column) -> Column:
    """[0..n-1] that is EMPTY for n=0 — a bare sequence(0, n-1) would infer a
    descending step and yield [0, -1], making transforms index out of range."""
    return F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>"))


def _reverse_run_end(cont_flags: Column, n: Column) -> Column:
    """cont_flags: array<boolean>. Returns array<int> end where end[i] is the
    first index j >= i with !cont[j] (or n). Reverse fold, prepending."""
    idx_desc = F.when(n > 0, F.sequence(n - 1, F.lit(0), F.lit(-1))).otherwise(F.array().cast("array<int>"))
    folded = F.aggregate(
        idx_desc,
        F.array(n.cast("int")),
        lambda acc, j: F.concat(
            F.array(F.when(F.element_at(cont_flags, j + 1), F.element_at(acc, 1))
                    .otherwise(j.cast("int"))),
            acc,
        ),
    )
    return F.slice(folded, 1, n.cast("int"))


def _flag_exprs(tokens: Column, with_contact_rule: bool) -> dict[str, Column]:
    """Per-token boolean/derived arrays consumed by the label fold.

    IMPORTANT: higher-order functions evaluate interpreted (no codegen, no
    common-subexpression caching), so every one of these MUST be bound as a
    real column (withColumn) before the fold references it — an inlined
    subtree would be recomputed on every element_at access, turning the
    linear automaton into O(n²·rules) work per row."""
    n = F.size(tokens)
    lows = F.transform(tokens, F.lower)
    out: dict[str, Column] = {"lows": lows}
    out["is_num"] = F.transform(tokens, lambda t: t.rlike(_NUM_PATTERN))
    out["is_phone"] = F.transform(tokens, lambda t: t.rlike(_PHONE_PATTERN)
                                  & F.lit(with_contact_rule))
    out["is_loc_kw"] = F.transform(tokens, lambda t: t.rlike(_LOC_KW_PATTERN))
    # isin → Catalyst InSet (hash-set membership)
    out["is_ctx"] = F.transform(lows, lambda t: t.isin(*_LOC_CTX_SET))
    out["is_prod"] = F.transform(lows, lambda t: t.isin(*_PROD_SET))
    out["is_desc"] = F.transform(lows, lambda t: t.isin(*_DESC_SET))
    out["is_trig"] = F.transform(lows, lambda t: t.isin(*_TRIGGER_SET))
    return out


def _cont_exprs(flags: dict[str, Column]) -> dict[str, Column]:
    """Greedy-run continuation flags. Bound separately from the run-end
    folds: the fold reads its cont array once per index, so an inlined cont
    subtree would be recomputed per access (O(n²)+)."""
    # cont = (loc_kw | num | ctx) & !phone
    loc_cont = F.zip_with(
        F.zip_with(flags["is_loc_kw"], flags["is_num"], lambda a, b: a | b),
        F.zip_with(flags["is_ctx"], flags["is_phone"],
                   lambda c, p: F.struct(c.alias("c"), p.alias("p"))),
        lambda ab, s: (ab | s["c"]) & ~s["p"],
    )
    prod_cont = F.zip_with(
        F.zip_with(flags["is_prod"], flags["is_num"], lambda a, b: a | b),
        F.zip_with(flags["is_desc"], flags["is_phone"],
                   lambda c, p: F.struct(c.alias("c"), p.alias("p"))),
        lambda ab, s: (ab | s["c"]) & ~s["p"],
    )
    return {"loc_cont": loc_cont, "prod_cont": prod_cont}


def _run_end_exprs(flags: dict[str, Column], n: Column) -> dict[str, Column]:
    cont = _cont_exprs(flags)
    return {"loc_end": _reverse_run_end(cont["loc_cont"], n),
            "prod_end": _reverse_run_end(cont["prod_cont"], n)}


def _label_fold(tokens: Column, flags: dict[str, Column],
                ends: dict[str, Column]) -> Column:
    """The rule-dispatch fold; all array inputs should be bound columns."""
    n = F.size(tokens)
    lows, is_num, is_phone = flags["lows"], flags["is_num"], flags["is_phone"]
    is_loc_kw, is_prod, is_trig = flags["is_loc_kw"], flags["is_prod"], flags["is_trig"]
    loc_end, prod_end = ends["loc_end"], ends["prod_end"]

    def step(acc, i):
        # acc: struct(skip int, labels array<string>); i: 0-based index
        e = lambda arr: F.element_at(arr, i + 1)       # this token
        e2 = lambda arr: F.element_at(arr, i + 2)      # lookahead +1
        e3 = lambda arr: F.element_at(arr, i + 3)      # lookahead +2
        lab = acc["labels"]

        phone_hit = e(is_phone)
        rule_phone = F.struct((i + 1).cast("int").alias("skip"),
                              F.concat(lab, F.array(F.lit("B-CONTACT_INFO"))).alias("labels"))

        r1a_ok = e(is_num) & (i + 1 < n) & (e2(lows) == "ብር")
        rule_1a = F.struct((i + 2).cast("int").alias("skip"),
                           F.concat(lab, F.array(F.lit("B-PRICE"), F.lit("I-PRICE"))).alias("labels"))

        # rule 1c: trigger [+ num [+ 'ብር']]
        has_num = (i + 1 < n) & e2(is_num)
        has_birr = (i + 2 < n) & (e3(lows) == "ብር")
        trig_len = F.when(has_num & has_birr, F.lit(3)).when(has_num, F.lit(2)).otherwise(F.lit(1))
        trig_labels = F.slice(F.array(F.lit("B-PRICE"), F.lit("I-PRICE"), F.lit("I-PRICE")),
                              1, trig_len)
        rule_1c = F.struct((i + trig_len).cast("int").alias("skip"),
                           F.concat(lab, trig_labels).alias("labels"))

        # rule 2: location run [i, loc_end[i])
        lend = e(loc_end)
        loc_ok = e(is_loc_kw) & (lend > i)
        loc_labels = F.concat(F.array(F.lit("B-LOC")),
                              F.array_repeat(F.lit("I-LOC"), (lend - i - 1).cast("int")))
        rule_2 = F.struct(lend.cast("int").alias("skip"),
                          F.concat(lab, loc_labels).alias("labels"))

        # rule 3: product run: token i + continuation [i+1, prod_end[i+1])
        pend = F.when(i + 1 < n, e2(prod_end)).otherwise((i + 1).cast("int"))
        prod_labels = F.concat(F.array(F.lit("B-PRODUCT")),
                               F.array_repeat(F.lit("I-PRODUCT"), (pend - i - 1).cast("int")))
        rule_3 = F.struct(pend.cast("int").alias("skip"),
                          F.concat(lab, prod_labels).alias("labels"))

        rule_o = F.struct((i + 1).cast("int").alias("skip"),
                          F.concat(lab, F.array(F.lit("O"))).alias("labels"))

        fired = (
            F.when(phone_hit, rule_phone)
            .when(r1a_ok, rule_1a)
            .when(e(is_trig), rule_1c)
            .when(loc_ok, rule_2)
            .when(e(is_prod), rule_3)
            .otherwise(rule_o)
        )
        return F.when(i < acc["skip"], acc).otherwise(fired)

    init = F.struct(F.lit(0).cast("int").alias("skip"),
                    F.array().cast("array<string>").alias("labels"))
    folded = F.aggregate(_idx_seq(n), init, step)
    return F.when(n > 0, folded["labels"]).otherwise(F.array().cast("array<string>"))


def label_tokens_expr(tokens: Column, with_contact_rule: bool = True) -> Column:
    """array<string> tokens → array<string> BIO labels (same length).

    Inline single-Column form — convenient for tests/small inputs. The hot
    path is ``with_entities_expr``, which binds every intermediate array as a
    column first (interpreted HOF eval recomputes inlined subtrees per
    access)."""
    flags = _flag_exprs(tokens, with_contact_rule)
    ends = _run_end_exprs(flags, F.size(tokens))
    return _label_fold(tokens, flags, ends)


# ---------------------------------------------------------------------------
# entity grouping (kernels.labeler.group_entities semantics)
# ---------------------------------------------------------------------------

def _etypes_expr(labels: Column) -> Column:
    return F.transform(labels, lambda l: F.when(
        l.startswith("B-") | l.startswith("I-"), F.substring(l, 3, 2147483647)))


def _known_expr(etypes: Column) -> Column:
    return F.transform(etypes, lambda t: t.isin("PRODUCT", "PRICE", "LOC", "CONTACT_INFO"))


def _start_expr(labels: Column, etypes: Column, known: Column) -> Column:
    is_b = F.transform(labels, lambda l: l.startswith("B-"))
    return F.transform(_idx_seq(F.size(labels)), lambda i: F.element_at(known, i + 1) & (
        F.element_at(is_b, i + 1)
        | (i == 0)
        | ~F.coalesce(F.element_at(known, i), F.lit(False))
        | (F.coalesce(F.element_at(etypes, i), F.lit(""))
           != F.element_at(etypes, i + 1))
    ))


def _brk_cont_expr(known: Column, start: Column) -> Column:
    """cont[i] := !brk[i+1] (index-shifted break flags) — MUST be bound as a
    column before feeding _reverse_run_end (see _cont_exprs note)."""
    n = F.size(known)
    idx = _idx_seq(n)
    return F.transform(idx, lambda i: F.when(
        i + 1 < n,
        F.element_at(known, i + 2) & ~F.element_at(start, i + 2),
    ).otherwise(F.lit(False)))


def _next_break_expr(known: Column, start: Column) -> Column:
    """next_break[i] = first j>i with (not known[j] or start[j]), else n.
    Inline form for single-column use; the hot path binds _brk_cont_expr."""
    n = F.size(known)
    nb = _reverse_run_end(_brk_cont_expr(known, start), n)
    return F.transform(_idx_seq(n), lambda i: F.element_at(nb, i + 1) + 1)


def _runs(tokens: Column, labels: Column):
    """start/break boolean algebra over the BIO sequence (inline form)."""
    etypes = _etypes_expr(labels)
    known = _known_expr(etypes)
    start = _start_expr(labels, etypes, known)
    return etypes, start, _next_break_expr(known, start)


def _phrases_from_runs(tokens: Column, etypes: Column, start: Column,
                       next_break: Column, etype: str) -> Column:
    n = F.size(etypes)
    starts = F.filter(_idx_seq(n), lambda i:
                      F.element_at(start, i + 1) & (F.element_at(etypes, i + 1) == etype))
    phrases = F.transform(starts, lambda i: F.array_join(
        F.slice(tokens, i + 1, F.element_at(next_break, i + 1) - i), " "))
    return F.when(n > 0, phrases).otherwise(F.array().cast("array<string>"))


def entity_phrases_expr(tokens: Column, labels: Column, etype: str) -> Column:
    """Space-joined phrases of entity runs of the given type, in order.
    NOTE: inlines the full run computation — for more than one entity type
    use ``with_entities_expr`` which binds intermediates as columns (keeps
    the analyzer's expression tree bounded)."""
    etypes, start, next_break = _runs(tokens, labels)
    return _phrases_from_runs(tokens, etypes, start, next_break, etype)


def with_entities_expr(df, clean_col: str = "preprocessed_text",
                       with_contact_rule: bool = True):
    """DataFrame-level fused JVM extractor: adds tokens/labels/entity
    columns. EVERY intermediate array is bound via withColumn: (a) the
    analyzer sees bounded attribute references instead of an exponentially
    inlined tree, and (b) interpreted HOF eval computes each array once per
    row instead of once per element_at access."""
    # batched projections: each withColumns call is ONE Project (interpreted
    # projections copy the whole row, so projection count is the constant
    # factor here); bindings within a batch only reference earlier batches
    n = F.size(F.col("tokens"))
    df = df.withColumn("tokens", tokenize_message_expr(F.col(clean_col)))
    flags = _flag_exprs(F.col("tokens"), with_contact_rule)
    df = df.withColumns({f"_f_{k}": e for k, e in flags.items()})
    bound_flags = {k: F.col(f"_f_{k}") for k in flags}
    conts = _cont_exprs(bound_flags)
    df = df.withColumns({f"_c_{k}": e for k, e in conts.items()})
    df = df.withColumns({
        "_e_loc_end": _reverse_run_end(F.col("_c_loc_cont"), n),
        "_e_prod_end": _reverse_run_end(F.col("_c_prod_cont"), n),
    })
    bound_ends = {"loc_end": F.col("_e_loc_end"), "prod_end": F.col("_e_prod_end")}
    df = df.withColumn("labels", _label_fold(F.col("tokens"), bound_flags, bound_ends))

    df = df.withColumn("_g_etypes", _etypes_expr(F.col("labels")))
    df = df.withColumn("_g_known", _known_expr(F.col("_g_etypes")))
    df = df.withColumn("_g_start", _start_expr(F.col("labels"), F.col("_g_etypes"),
                                               F.col("_g_known")))
    df = df.withColumn("_g_bc", _brk_cont_expr(F.col("_g_known"), F.col("_g_start")))
    df = df.withColumn("_g_nb0", _reverse_run_end(F.col("_g_bc"), F.size("labels")))
    df = df.withColumn("_g_nb", F.transform(
        _idx_seq(F.size("labels")), lambda i: F.element_at(F.col("_g_nb0"), i + 1) + 1))
    df = df.withColumns({
        name: _phrases_from_runs(F.col("tokens"), F.col("_g_etypes"),
                                 F.col("_g_start"), F.col("_g_nb"), etype)
        for etype, name in (("PRODUCT", "products"), ("PRICE", "prices"),
                            ("LOC", "locations"), ("CONTACT_INFO", "contacts"))
    })
    df = df.withColumn(
        "price_values",
        F.filter(F.transform(F.col("prices"), parse_price_expr), lambda v: v.isNotNull()))
    temps = ([f"_f_{k}" for k in flags] + ["_c_loc_cont", "_c_prod_cont",
             "_e_loc_end", "_e_prod_end", "_g_etypes", "_g_known", "_g_start",
             "_g_bc", "_g_nb0", "_g_nb"])
    return df.drop(*temps)


def parse_price_expr(phrase: Column) -> Column:
    """notebook-03 extract_numerical_price: strip the {ብ,ር,b,i,r,ws,comma}
    charclass then cast, null on failure."""
    return F.regexp_replace(F.lower(phrase), r"(?U)[ብርbirr\s,]", "").try_cast("double")
