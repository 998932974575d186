"""Deterministic synthetic conversation-transcript table (FIXTURES.md §F1).

Schema (BASELINE.json input_hint): conv_id string, turn_idx int, role
string, text string, tool string, ts timestamp — plus a ``day`` partition
column standing in for an Iceberg ``days(ts)`` partition at local scale.

Everything is generated with JVM-side expressions seeded by
``xxhash64(conv_id, turn_idx)``, so the data is deterministic regardless of
parallelism or partition count — the property that lets local[8] and
local[32] benchmark runs see byte-identical input, and lets tests assert
exact planted-violation counts.

Planted violations (rates per FIXTURES.md, exact hash-mod rules):
  * ``text`` NULL where hash % 1000 == 7
  * duplicate (conv_id, turn_idx) where turn_idx % 500 == 13
  * referential gap: turn_idx == 1 removed where xxhash64(conv_id) % 250 == 5
  * role = 'operator' where hash % 2000 == 11
  * tool non-NULL on a user turn where hash % 3000 == 17
  * ts decreased vs previous turn where hash % 4000 == 19
  * drift: rows with day >= 2025-01-25 draw longer text and an
    assistant-skewed role mix
Hot-key knob: 4 conversations (`conv_hot_0000000{0..3}`) with 10,000 turns
each exercise the skew paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GEOMETRIC_MEAN_TURNS = 12
BASE_DATE = "2025-01-01"
DRIFT_DAY = 24  # days >= 2025-01-25 are the drifted window


def _u(col, salt: int):
    """Deterministic uniform(0,1) from a column + salt (JVM-side)."""
    return (
        F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1_000_000_007)).cast("double")
        / F.lit(1_000_000_007.0)
    )


def generate_transcripts(
    spark: SparkSession,
    n_conversations: int = 1_000,
    hot_conversations: int = 4,
    hot_turns: int = 10_000,
    partitions: int | None = None,
    max_text_chars: int = 20_000,
) -> DataFrame:
    """Build the transcript DataFrame; ~n_conversations * 12 rows."""
    convs = spark.range(n_conversations).select(
        F.format_string("conv_%08d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv_no"),
    )
    # geometric(mean 12) turn count via inverse-CDF on a per-conv uniform
    p = 1.0 / GEOMETRIC_MEAN_TURNS
    u = _u(F.col("conv_id"), 1)
    n_turns = F.least(
        F.greatest(
            F.ceil(F.log(F.lit(1.0) - u) / F.log(F.lit(1.0 - p))).cast("int"),
            F.lit(1),
        ),
        F.lit(500),
    )
    convs = convs.withColumn("n_turns", n_turns)

    if hot_conversations > 0:
        hot = spark.range(hot_conversations).select(
            F.format_string("conv_hot_%07d", F.col("id")).alias("conv_id"),
            (F.lit(10_000_000) + F.col("id")).alias("conv_no"),
            F.lit(hot_turns).alias("n_turns"),
        )
        convs = convs.unionByName(hot)

    if partitions:
        convs = convs.repartition(partitions, "conv_id")

    turns = convs.select(
        "conv_id",
        "conv_no",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    h = F.xxhash64("conv_id", "turn_idx")
    hp = F.pmod(h, F.lit(12_000_000))  # one positive base for all mod rules
    day_no = F.pmod(F.col("conv_no"), F.lit(30))
    is_drift = day_no >= F.lit(DRIFT_DAY)

    # role mix: turn 0 = system; odd turns = user; even turns mostly
    # assistant with some tool; drifted days skew harder to assistant
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(F.pmod(hp, F.lit(2000)) == 11, F.lit("operator"))  # violation
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 1, F.lit("user"))
        .when(
            is_drift,
            F.when(F.pmod(hp, F.lit(10)) == 0, F.lit("tool")).otherwise(
                F.lit("assistant")
            ),
        )
        .when(F.pmod(hp, F.lit(4)) == 0, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )

    # approx lognormal length: exp(mu + sigma * z), z ~ Irwin-Hall normal
    z = (
        (_u(h, 2) + _u(h, 3) + _u(h, 4) + _u(h, 5) - F.lit(2.0))
        * F.lit(1.7320508)
    )
    mu = F.when(is_drift, F.lit(6.3)).otherwise(F.lit(5.5))
    sigma = F.when(is_drift, F.lit(1.2)).otherwise(F.lit(1.0))
    text_len = F.least(
        F.greatest(F.exp(mu + sigma * z).cast("int"), F.lit(1)),
        F.lit(int(max_text_chars)),
    )
    # seed text from xxhash64+hex, NOT sha2: Spark's sha2 goes through
    # java.security MessageDigest lookup whose synchronization becomes a
    # futex storm at 32 threads (measured: 92% sys time, Stage stuck)
    seedtext = F.lower(
        F.concat(
            F.hex(h),
            F.hex(F.xxhash64(h, F.lit(101))),
            F.hex(F.xxhash64(h, F.lit(202))),
            F.hex(F.xxhash64(h, F.lit(303))),
        )
    )
    text = F.when(F.pmod(hp, F.lit(1000)) == 7, F.lit(None).cast("string")).otherwise(
        F.substring(
            F.repeat(seedtext, (text_len / F.lit(64)).cast("int") + 2),
            1,
            text_len,
        )
    )

    tool = (
        F.when(
            role == "tool",
            F.element_at(
                F.array(F.lit("search"), F.lit("python"), F.lit("browser")),
                (F.pmod(hp, F.lit(3)) + 1).cast("int"),
            ),
        )
        .when(  # violation: tool set on a user turn
            (role == "user") & (F.pmod(hp, F.lit(3000)) == 17),
            F.lit("search"),
        )
        .otherwise(F.lit(None).cast("string"))
    )

    # ts: base + day + intra-day conv offset + 7s per turn; ordering
    # violation subtracts 30s
    ts_seconds = (
        day_no * F.lit(86_400)
        + F.pmod(F.col("conv_no"), F.lit(1_000)) * F.lit(60)
        + F.col("turn_idx") * F.lit(7)
        - F.when(F.pmod(hp, F.lit(4000)) == 19, F.lit(30)).otherwise(F.lit(0))
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(BASE_DATE), "yyyy-MM-dd") + ts_seconds
    )

    rows = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
        F.date_format(ts, "yyyy-MM-dd").alias("day"),
    )

    # referential gap: drop turn 1 for ~1/250 conversations
    gap = F.pmod(F.xxhash64("conv_id"), F.lit(250)) == 5
    rows = rows.filter(~((F.col("turn_idx") == 1) & gap))

    # duplicate PK violation: re-emit rows where turn_idx % 500 == 13
    dups = rows.filter(F.pmod(F.col("turn_idx"), F.lit(500)) == 13)
    return rows.unionByName(dups)


def default_suite():
    """The transcript-table expectation suite the north rule describes."""
    from great_expectations_spark.core.suite import ExpectationSuite

    suite = ExpectationSuite("transcripts.default")
    suite.add("expect_column_values_to_not_be_null", column="conv_id")
    suite.add("expect_column_values_to_not_be_null", column="turn_idx")
    suite.add("expect_column_values_to_not_be_null", column="text", mostly=0.995)
    suite.add(
        "expect_column_values_to_be_in_set",
        column="role",
        value_set=["system", "user", "assistant", "tool"],
        mostly=0.999,
    )
    suite.add(
        "expect_column_values_to_be_in_set",
        column="tool",
        value_set=["search", "python", "browser"],
    )
    suite.add(
        "expect_column_values_to_be_between",
        column="turn_idx",
        min_value=0,
    )
    suite.add(
        "expect_column_value_lengths_to_be_between",
        column="text",
        min_value=1,
        max_value=20_000,
    )
    suite.add(
        "expect_compound_columns_to_be_unique",
        column_list=["conv_id", "turn_idx"],
        mostly=0.99,
    )
    suite.add(
        "expect_column_values_to_be_increasing",
        column="ts",
        partition_by="conv_id",
        order_by="turn_idx",
        mostly=0.99,
    )
    suite.add(
        "expect_sequence_to_be_contiguous",
        group_column="conv_id",
        index_column="turn_idx",
        mostly=0.99,
    )
    suite.add("expect_column_mean_to_be_between", column="turn_idx", min_value=0)
    suite.add(
        "expect_column_unique_value_count_to_be_between",
        column="conv_id",
        min_value=1,
        approximate=True,
    )
    return suite
