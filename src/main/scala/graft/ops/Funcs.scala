package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function families (SURVEY.md §2.6). Spark INT-returning
  * functions (year, length, size, datediff, ...) are cast to BIGINT to
  * match DuckDB; float array elements are cast to DOUBLE before
  * arithmetic (FIXTURES.md type-mapping table). */
object Funcs {

  val fnString: Q = (s, d) =>
    table(s, d, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("u"),
        lower(col("p_type")).as("lo"),
        substring(col("p_name"), 1, 10).as("pfx"),
        asLong(length(col("p_name"))).as("len"),
        regexp_replace(col("p_brand"), "#", "-").as("rep"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("cat"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        col("p_type").contains("ECO").as("has_eco"),
        regexp_extract(col("p_brand"), "#([0-9]+)", 1).as("brand_num"))
      .orderBy("p_partkey")

  val fnString2: Q = (s, d) =>
    table(s, d, "part")
      .select(
        col("p_partkey"),
        substring(col("p_name"), 1, 4).as("l4"),
        expr("right(p_name, 4)").as("r4"),
        lpad(col("p_brand"), 12, "*").as("lp"),
        rpad(col("p_brand"), 12, "*").as("rp"),
        split_part(col("p_type"), lit(" "), lit(1)).as("first_word"),
        reverse(col("p_name")).as("rev"),
        repeat(col("p_brand"), 2).as("rep2"),
        asLong(instr(col("p_name"), "a")).as("pos_a"),
        col("p_name").startsWith("small").as("is_small"))
      .orderBy("p_partkey")

  val fnDate: Q = (s, d) =>
    table(s, d, "orders")
      .filter(col("o_orderkey") <= 500)
      .select(
        col("o_orderkey"),
        asLong(year(col("o_orderdate"))).as("y"),
        asLong(month(col("o_orderdate"))).as("m"),
        asLong(dayofmonth(col("o_orderdate"))).as("d"),
        date_trunc("month", col("o_orderdate")).as("mstart"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"))
      .orderBy("o_orderkey")

  /** Extended date-part family. Spark's dayofweek is 1=Sunday while
    * DuckDB's is 0=Sunday — normalized to DuckDB's here. */
  val fnDate2: Q = (s, d) =>
    table(s, d, "orders")
      .filter(col("o_orderkey") <= 300)
      .select(
        col("o_orderkey"),
        asLong(hour(col("o_orderdate"))).as("h"),
        asLong(minute(col("o_orderdate"))).as("mi"),
        asLong(dayofweek(col("o_orderdate")) - 1).as("dow"),
        last_day(col("o_orderdate")).as("ld"),
        asLong(quarter(col("o_orderdate"))).as("q"),
        asLong(dayofyear(col("o_orderdate"))).as("doy"),
        col("o_orderdate").cast(DateType).as("d_only"))
      .orderBy("o_orderkey")

  /** Formatting family (printf-style and date patterns). */
  val fnFormat: Q = (s, d) =>
    table(s, d, "orders")
      .filter(col("o_orderkey") <= 400)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        date_format(col("o_orderdate"), "yyyy/MM/dd").as("ymd"),
        format_string("%.2f", col("o_totalprice")).as("price_s"),
        format_string("%08d", col("o_orderkey")).as("key_pad"),
        concat(col("o_orderstatus"), lit("/"),
          year(col("o_orderdate")).cast("string")).as("tag"))
      .orderBy("o_orderkey")

  val fnDatediffJoin: Q = (s, d) => {
    val l = table(s, d, "lineitem").filter(col("l_orderkey") <= 1000)
    val o = table(s, d, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(
        l("l_orderkey"), l("l_linenumber"),
        asLong(datediff(col("l_shipdate"), col("o_orderdate"))).as("ship_delay_days"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val fnMath: Q = (s, d) =>
    table(s, d, "lineitem")
      .filter(col("l_orderkey") <= 1000)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_extendedprice") - 30000.0), 2).as("a"),
        ceil(col("l_quantity")).as("c"),
        floor(col("l_discount") * 100).as("f"),
        round(sqrt(col("l_extendedprice")), 4).as("sq"),
        round(log(col("l_extendedprice") + 1), 6).as("lg"),
        round(pow(col("l_quantity"), 2), 2).as("p2"),
        (col("l_orderkey") % 7).as("m7"))
      .orderBy("l_orderkey", "l_linenumber")

  val fnConditional: Q = (s, d) =>
    table(s, d, "orders")
      .filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000.0, "big")
          .when(col("o_totalprice") > 100000.0, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"),
        greatest(col("o_totalprice"), lit(50000.0)).as("g"),
        least(col("o_totalprice"), lit(50000.0)).as("l"))
      .orderBy("o_orderkey")

  val fnArray: Q = (s, d) =>
    table(s, d, "embeddings")
      .select(
        col("vec_id"), col("label"),
        asLong(size(col("embedding"))).as("dim"),
        round(element_at(col("embedding"), 1).cast(DoubleType), 6).as("first_elem"),
        round(
          aggregate(slice(col("embedding"), 1, 8), lit(0.0),
            (acc, x) => acc + x.cast(DoubleType)), 6).as("head8_sum"))
      .orderBy("vec_id")

  /** Per-element round(x,6) is deliberately avoided here: DuckDB rounds
    * via scaled-double std::round while Spark rounds the exact decimal
    * expansion — they diverge ~2e-5/value, enough to flip a downstream
    * 4dp rounding. A single double sum is order-stable (each vector's
    * 64 elements aggregate in array order in one partition on both
    * engines). */
  val fnExplodeUnnest: Q = (s, d) =>
    table(s, d, "embeddings")
      .select(col("vec_id"), explode(col("embedding")).as("v"))
      .groupBy(col("vec_id"))
      .agg(
        count(lit(1)).as("n_elems"),
        round(sum(abs(col("v").cast(DoubleType))), 4).as("abs_sum"))
      .orderBy("vec_id")

  /** Regex family. DuckDB regexp_matches is contains-semantics like
    * Spark rlike; the pattern is anchored so both match whole names. */
  val fnRegex: Q = (s, d) =>
    table(s, d, "part")
      .select(
        col("p_partkey"),
        regexp_replace(col("p_brand"), "[0-9]+", "N").as("brand_n"),
        col("p_name").rlike("^[a-z]+ [a-z]+$").as("two_words"),
        regexp_extract(col("p_type"), "([A-Z]+)", 1).as("first_caps"),
        asLong(size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0))))
          .as("n_vowels"))
      .orderBy("p_partkey")

  /** Array function family over the embedding vectors. */
  val fnArray2: Q = (s, d) =>
    table(s, d, "embeddings")
      .filter(col("vec_id") < 300)
      .select(
        col("vec_id"),
        array_contains(col("embedding"), element_at(col("embedding"), 1)).as("has_first"),
        array_position(col("embedding"), element_at(col("embedding"), 3)).as("pos3"),
        asLong(size(array_distinct(col("embedding")))).as("n_distinct"),
        round(array_max(transform(col("embedding"), x => abs(x.cast(DoubleType)))), 6)
          .as("max_abs"),
        asLong(size(filter(col("embedding"), x => x > 0))).as("n_pos"))
      .orderBy("vec_id")

  /** NULL-semantics family: null-safe equality, nullif/ifnull chains,
    * null-aware counts (the testdata is null-free, so nulls are
    * manufactured with nullif to exercise the paths). */
  val fnNulls: Q = (s, d) => {
    val st = nullif(col("o_orderstatus"), lit("O"))
    table(s, d, "orders")
      .filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        st.isNull.as("was_open"),
        (st <=> lit("F")).as("is_f_nullsafe"),
        coalesce(st, lit("OPEN")).as("st2"),
        when(st.isNull, col("o_totalprice")).otherwise(lit(0.0)).as("open_price"),
        st.isNotNull.cast("int").cast("long").as("non_null_flag"))
      .orderBy("o_orderkey")
  }

  val fnJson: Q = (s, d) => {
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    table(s, d, "events")
      .filter(k > 50)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_high"), sum(k).as("k_sum"))
      .orderBy("event_type")
  }

  /** Bitwise family (round 3): and/or/xor, shifts, popcount — all
    * BIGINT-exact, no float hazard. bit_count is INT in Spark, cast to
    * match DuckDB's integer-widened result. */
  val fnBitwise: Q = (s, d) =>
    table(s, d, "lineitem")
      .filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), asLong(col("l_linenumber")).as("ln"),
        col("l_orderkey").bitwiseAND(col("l_partkey")).as("b_and"),
        col("l_orderkey").bitwiseOR(col("l_partkey")).as("b_or"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("b_xor"),
        shiftleft(col("l_partkey"), 3).as("b_shl"),
        shiftright(col("l_partkey"), 2).as("b_shr"),
        asLong(bit_count(col("l_partkey"))).as("b_pop"))
      .orderBy("l_orderkey", "ln")

  /** Cryptographic digest family (round 3): md5 + sha-256 hex digests —
    * the content-addressing primitives behind dedup_exact and the
    * sampling bucketing, surfaced as first-class scalars. */
  val fnHash: Q = (s, d) =>
    table(s, d, "documents")
      .filter(col("doc_id") % 11 === 0)
      .select(col("doc_id"), md5(col("text")).as("h_md5"),
        sha2(col("text"), 256).as("h_sha256"))
      .orderBy("doc_id")

  /** try_cast ingestion hygiene (round 3): malformed values become NULL
    * instead of failing the job — the safe-parse family every raw-data
    * ingest needs (id extraction from composite strings, opportunistic
    * date parsing, string→decimal round-trips). ANSI-safe in both
    * engines: Spark TRY_CAST == DuckDB TRY_CAST on these inputs. */
  val fnTryCast: Q = (s, d) =>
    table(s, d, "customer")
      .select(
        col("c_custkey"),
        expr("try_cast(substr(c_name, 10) AS BIGINT)").as("id_digits"),
        expr("try_cast(c_mktsegment AS BIGINT)").as("seg_num"),
        expr("try_cast(concat(cast(c_custkey AS STRING), '.5') AS DOUBLE)")
          .as("with_half"),
        expr("try_cast(CASE WHEN c_custkey % 3 = 0 THEN '2024-01-15' " +
          "ELSE 'not a date' END AS DATE)").as("maybe_date"),
        // try_cast→DECIMAL is the exercise; output as DOUBLE because a
        // decimal column is hash-fragile in cross-engine compares
        // (Decimal("8500.10") vs float 8500.1 stringify differently).
        expr("cast(try_cast(cast(c_acctbal AS STRING) AS DECIMAL(18,2)) AS DOUBLE)")
          .as("bal_dec"))
      .orderBy("c_custkey")

  /** Blocked fuzzy match (round 4): part-name pairs within Levenshtein
    * distance 2, BLOCKED on the name's noun so the quadratic edit-
    * distance evaluation runs only inside small equi-join buckets —
    * the canonical scale shape for fuzzy joins (block, then verify);
    * an unblocked fuzzy join is an all-pairs cartesian. Both engines
    * share the same unit-cost Levenshtein definition. */
  val fnFuzzyMatch: Q = (s, d) => {
    val p = table(s, d, "part")
      .filter(col("p_partkey") % 20 === 0)
      // try_element_at: a one-word name yields NULL noun (joined away)
      // like DuckDB's list index, instead of an ANSI INVALID_ARRAY_INDEX
      .select(col("p_partkey"), col("p_name"),
        try_element_at(split(col("p_name"), " "), lit(2)).as("noun"))
    val a = p.toDF("p1", "n1", "noun")
    val b = p.toDF("p2", "n2", "noun2")
    a.join(b, col("noun") === col("noun2") && col("p1") < col("p2"))
      .withColumn("dist", asLong(levenshtein(col("n1"), col("n2"))))
      .filter(col("dist") <= 2)
      .select(col("noun"), col("p1"), col("p2"), col("dist"))
      .orderBy("noun", "p1", "p2")
  }

  /** Binary/base64 function family (§2.6, r6): UTF-8 encode ->
    * base64 -> decode roundtrip plus encoded lengths — the
    * binary-payload plumbing multimodal columns ride on (both
    * engines emit unwrapped RFC-4648 base64). */
  val fnBase64Roundtrip: Q = (s, d) =>
    table(s, d, "supplier")
      .select(col("s_suppkey"),
        base64(encode(col("s_name"), "UTF-8")).as("b64"),
        (decode(unbase64(base64(encode(col("s_name"), "UTF-8"))), "UTF-8")
          === col("s_name")).as("roundtrip_ok"),
        asLong(length(base64(encode(col("s_name"), "UTF-8")))).as("b64_len"))
      .orderBy("s_suppkey")

  /** Array set-operation family (§2.18, r8): intersect/except/union/
    * overlap between the head-8 and tail-8 slices of each embedding.
    * Only SIZES are emitted — Spark's set ops return distinct
    * elements in first-argument order while DuckDB's list kernels
    * make no order promise, so cardinalities are the portable
    * contract (both sides deduplicate before counting). Float
    * equality compares identical bits (same parquet values both
    * engines). */
  val fnArraySetops: Q = (s, d) => {
    val h = slice(col("embedding"), 1, 8)
    val t = slice(col("embedding"), 57, 8)
    table(s, d, "embeddings")
      .filter(col("vec_id") < 400)
      .select(col("vec_id"),
        asLong(size(array_intersect(h, t))).as("n_inter"),
        asLong(size(array_except(h, t))).as("n_except"),
        asLong(size(array_union(h, t))).as("n_union"),
        arrays_overlap(h, t).as("overlap"))
      .orderBy("vec_id")
  }

  /** Third string family (§2.18b): translate / ascii / chr /
    * ends_with — the character-mapping functions the first two string
    * families don't touch. All deterministic byte-level operations. */
  val fnString3: Q = (s, d) =>
    table(s, d, "part")
      .filter(col("p_partkey") <= 400)
      .select(col("p_partkey"),
        translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
        asLong(ascii(substring(col("p_brand"), 1, 1))).as("asc1"),
        chr(pmod(col("p_partkey"), lit(26)) + 97).as("key_chr"),
        col("p_name").endsWith("e").as("ends_e"))
      .orderBy("p_partkey")

  /** Extended math family (§2.18, r8): log2/log10/cbrt/sign/degrees —
    * deterministic IEEE unary functions (identical doubles in, one
    * round each out); sign normalized to BIGINT (DuckDB returns
    * INTEGER, Spark DOUBLE). */
  val fnMath2: Q = (s, d) =>
    table(s, d, "lineitem")
      .filter(col("l_orderkey") <= 800)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(log2(col("l_extendedprice")), 6).as("lg2"),
        round(log10(col("l_extendedprice")), 6).as("lg10"),
        round(cbrt(col("l_quantity")), 6).as("cbrt_q"),
        asLong(signum(col("l_extendedprice") - 50000.0)).as("sgn"),
        round(degrees(col("l_discount")), 6).as("deg"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Calendar-boundary date family (§2.18c): quarter, week/quarter
    * truncation, last day of month, day-of-year, ISO week — the
    * fiscal/ISO boundary functions fn_date/fn_date2 don't cover. Both
    * engines truncate weeks to Monday and number weeks ISO-style;
    * outputs normalized to DATE/BIGINT. Per-row, linear. */
  val fnDate3: Q = (s, d) =>
    table(s, d, "orders")
      .filter(col("o_orderkey") <= 300)
      .select(col("o_orderkey"),
        asLong(quarter(col("o_orderdate"))).as("qtr"),
        to_date(date_trunc("week", col("o_orderdate"))).as("wk"),
        to_date(date_trunc("quarter", col("o_orderdate"))).as("qstart"),
        last_day(to_date(col("o_orderdate"))).as("eom"),
        asLong(dayofyear(col("o_orderdate"))).as("doy"),
        asLong(weekofyear(col("o_orderdate"))).as("woy"))
      .orderBy("o_orderkey")

  /** Positional/ordering array family (§2.18d): position, slice,
    * sorted extremes, reverse head — the access patterns
    * fn_array/fn_array2/fn_array_setops don't cover. Position
    * normalized to 0-on-missing (Spark's convention; DuckDB returns
    * NULL); sorted/sliced outputs rendered as scalars so no
    * engine-specific array encoding reaches the result. Per-row,
    * linear. */
  val fnArray3: Q = (s, d) => {
    val arr = split(col("text"), " ")
    table(s, d, "documents")
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"),
        asLong(array_position(arr, "the")).as("pos_the"),
        array_join(slice(arr, 1, 5), " ").as("head5"),
        element_at(sort_array(arr), 1).as("min_w"),
        element_at(sort_array(arr), -1).as("max_w"),
        element_at(reverse(arr), 1).as("last_w"),
        asLong(size(array_distinct(slice(arr, 1, 20)))).as("d20"))
      .orderBy("doc_id")
  }

  /** Sequence/range generator family (§2.18e): integer and date
    * sequences with lambda fold/filter over them — the generator
    * functions (Spark `sequence` + higher-order `aggregate`/`filter`,
    * DuckDB `generate_series` + `list_sum`/`list_filter`) that
    * fn_array/fn_explode_unnest consume but never construct. All
    * outputs are exact integer scalars (sizes/sums) — no
    * engine-specific array encoding reaches the result. Per-row,
    * linear, on a keyspace-deterministic sample. */
  /** Map-type family (§2.18f): construction, key lookup, cardinality,
    * concat-with-new-key (Spark's default dedup policy forbids
    * duplicate keys in map_concat), rendered keys — the
    * associative-container
    * functions the array families don't cover (Spark `map`/
    * `element_at`/`map_concat`, DuckDB `map(...)` + `[key][1]` — its
    * extraction yields a 1-element list — + `map_keys`). All outputs
    * are scalars (strings/BIGINT); no engine-specific map encoding
    * reaches the result. Map key ORDER is insertion order in both
    * engines (verified by probe), so the rendered key list is
    * deterministic. Per-row, linear, keyspace-deterministic sample. */
  val fnMap: Q = (s, d) =>
    table(s, d, "orders")
      .filter(col("o_orderkey") % 101 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        map(lit("status"), col("o_orderstatus"),
          lit("pri"), col("o_orderpriority")).as("m"))
      .select(col("o_orderkey"),
        element_at(col("m"), "status").as("status_v"),
        element_at(col("m"), "pri").as("pri_v"),
        element_at(col("m"), "missing").as("missing_v"),
        asLong(size(col("m"))).as("n_keys"),
        array_join(map_keys(col("m")), ",").as("keys_csv"),
        element_at(
          map_concat(col("m"), map(lit("extra"), upper(col("o_orderstatus")))),
          "extra").as("concat_v"))
      .orderBy("o_orderkey")

  val fnSequence: Q = (s, d) =>
    table(s, d, "orders")
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), (col("o_orderkey") % 10 + 1).as("n"),
        to_date(col("o_orderdate")).as("od"))
      .select(col("o_orderkey"), asLong(col("n")).as("n"),
        asLong(size(sequence(lit(1L), col("n")))).as("seq_sz"),
        expr("aggregate(sequence(1L, n), 0L, (a, x) -> a + x)").as("seq_sum"),
        asLong(expr("size(filter(sequence(1L, n), x -> x % 2 = 0))")).as("n_even"),
        asLong(size(sequence(col("od"), date_add(col("od"), col("n").cast("int")),
          expr("interval 1 day")))).as("dseq_sz"))
      .orderBy("o_orderkey")

  /** Nested struct-array collection (§2.26): each order's lineitems
    * collected into an ARRAY OF STRUCTS, deterministically sorted
    * (array_sort orders structs field-by-field; (shipdate, linenumber)
    * is unique per order), then fields extracted from the first/last
    * elements — the nested-object shape a naqed-style API returns for
    * one-to-many relations, proven as a flat declared query. Price
    * rides as BIGINT cents inside the struct so the extracted value is
    * one exact division. Scale: one orderkey shuffle into
    * collect_list; per-order arrays are line-count-bounded (≤7 rows),
    * so the aggregate state is tiny and the sort is in-row. */
  val fnNestedCollect: Q = (s, d) => {
    val li = table(s, d, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"),
        struct(to_date(col("l_shipdate")).as("sd"),
          asLong(col("l_linenumber")).as("ln"),
          (dec2(col("l_extendedprice")) * 100).cast(LongType).as("pc")).as("st"))
    li.groupBy(col("l_orderkey").as("orderkey"))
      .agg(array_sort(collect_list(col("st"))).as("arr"))
      .select(col("orderkey"), asLong(size(col("arr"))).as("n_lines"),
        element_at(col("arr"), 1).getField("sd").as("first_ship"),
        (element_at(col("arr"), 1).getField("pc").cast(DoubleType) / 100)
          .as("first_price"),
        element_at(col("arr"), -1).getField("sd").as("last_ship"))
      .orderBy("orderkey")
  }

}
