"""curate_by_partition: resumable, manifest-checkpointed curation runs
(checkpoint/curation_runner.py) — the validation checkpoint story
applied to the curation pipeline."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.checkpoint import curation_runner as cr


@pytest.fixture()
def docs(spark):
    rows = []
    for src in ("a", "b", "c"):
        for i in range(10):
            rows.append((ord(src) * 100 + i, f"{src} text number {i}", src))
        # one exact duplicate per partition for the dedup stage to drop
        rows.append((ord(src) * 100 + 50, f"{src} text number 0", src))
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


KW = dict(dedup_method="exact")


def test_curate_by_partition_runs_resumes_and_writes(
    spark, docs, tmp_path
):
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    summary = cr.curate_by_partition(
        docs, "source", out_dir, ckpt, curate_kwargs=KW, write_docs=True
    )
    assert summary["partitions"] == 3
    assert summary["executed"] == 3 and summary["resumed"] == 0
    assert summary["by_status"] == {"done": 3}
    # output: hive-style dirs, duplicate dropped, partition col dropped
    for src in ("a", "b", "c"):
        part = spark.read.parquet(os.path.join(out_dir, f"source={src}"))
        assert part.count() == 10
        assert "source" not in part.columns
    # manifest payload carries the attrition report
    entry = summary["entries"][0]
    with open(entry["result_path"]) as f:
        payload = json.load(f)
    assert [r["stage"] for r in payload["report"]] == [
        "input", "dedup[exact]",
    ]
    assert payload["report"][0]["rows"] == 11
    # docs pages rendered
    assert sorted(os.listdir(os.path.join(ckpt, "docs"))) == [
        "curation_a.html", "curation_b.html", "curation_c.html",
    ]
    # resume: nothing re-executes, same config hash
    again = cr.curate_by_partition(
        docs, "source", out_dir, ckpt, curate_kwargs=KW
    )
    assert again["executed"] == 0 and again["resumed"] == 3
    assert again["config_hash"] == summary["config_hash"]
    # changed config => new hash => full recompute
    other = cr.curate_by_partition(
        docs, "source", out_dir, str(tmp_path / "ckpt"),
        curate_kwargs=dict(dedup_method="exact", redact_kinds=["email"]),
    )
    assert other["config_hash"] != summary["config_hash"]
    assert other["executed"] == 3


def test_failed_partition_retries_on_next_run(
    spark, docs, tmp_path, monkeypatch
):
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    from great_expectations_spark.functions import curation as cur_mod

    real = cur_mod.curate_corpus

    def flaky(df, **kw):
        srcs = {r["source"] for r in df.select("source").distinct().collect()}
        if srcs == {"b"}:
            raise RuntimeError("simulated executor loss")
        return real(df, **kw)

    monkeypatch.setattr(cur_mod, "curate_corpus", flaky)
    first = cr.curate_by_partition(
        docs, "source", out_dir, ckpt, curate_kwargs=KW
    )
    assert first["by_status"] == {"done": 2, "failed": 1}
    failed = [e for e in first["entries"] if e["status"] == "failed"][0]
    assert failed["partition_id"] == "b"
    assert "simulated executor loss" in failed["error"]

    monkeypatch.setattr(cur_mod, "curate_corpus", real)
    second = cr.curate_by_partition(
        docs, "source", out_dir, ckpt, curate_kwargs=KW
    )
    # ONLY the failed partition re-runs
    assert second["executed"] == 1 and second["resumed"] == 2
    assert second["by_status"] == {"done": 3}
    part = spark.read.parquet(os.path.join(out_dir, "source=b"))
    assert part.count() == 10


def test_config_hash_tokens_and_guardrails(spark, docs, tmp_path):
    # DataFrame kwargs hash by schema, not identity
    bench1 = spark.createDataFrame([("x",)], "text string")
    bench2 = spark.createDataFrame([("completely different",)], "text string")
    h1 = cr.curation_config_hash({"benchmark_df": bench1, "decontam_n": 8})
    h2 = cr.curation_config_hash({"benchmark_df": bench2, "decontam_n": 8})
    h3 = cr.curation_config_hash({"benchmark_df": bench1, "decontam_n": 9})
    assert h1 == h2 and h1 != h3
    with pytest.raises(ValueError, match="with_report"):
        cr.curate_by_partition(
            docs, "source", str(tmp_path / "o"), str(tmp_path / "c"),
            curate_kwargs={"with_report": True},
        )


def test_null_partition_value_is_curated_not_dropped(spark, tmp_path):
    """`col == lit(None)` is never true — the NULL partition must use a
    null-safe match and Hive's __HIVE_DEFAULT_PARTITION__ directory."""
    rows = [(1, "alpha text", "a"), (2, "beta text", None),
            (3, "beta text two", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    summary = cr.curate_by_partition(
        df, "source", str(tmp_path / "out"), str(tmp_path / "ckpt"),
        curate_kwargs={},
    )
    assert summary["by_status"] == {"done": 2}
    null_part = spark.read.parquet(
        str(tmp_path / "out" / "source=__HIVE_DEFAULT_PARTITION__")
    )
    assert null_part.count() == 2
    entry = {e["partition_id"]: e for e in summary["entries"]}["None"]
    assert entry["rows"] == 2


def test_path_hostile_partition_values_are_escaped(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha text", "2024/01"), (2, "beta text", "a b")],
        "doc_id long, text string, source string",
    )
    summary = cr.curate_by_partition(
        df, "source", str(tmp_path / "out"), str(tmp_path / "ckpt"),
        curate_kwargs={}, write_docs=True,
    )
    assert summary["by_status"] == {"done": 2}
    assert os.path.isdir(str(tmp_path / "out" / "source=2024%2F01"))
    docs = sorted(os.listdir(str(tmp_path / "ckpt" / "docs")))
    assert docs == ["curation_2024%2F01.html", "curation_a%20b.html"]
    # Spark's partition discovery unescapes hive-style encoding
    back = spark.read.parquet(str(tmp_path / "out"))
    assert {r["source"] for r in back.select("source").collect()} == {
        "2024/01", "a b",
    }


def test_config_hash_covers_output_location(spark, docs, tmp_path):
    """'done' must mean THIS output exists: a different output_path or
    format recomputes instead of resuming."""
    ckpt = str(tmp_path / "ckpt")
    s1 = cr.curate_by_partition(
        docs, "source", str(tmp_path / "out1"), ckpt, curate_kwargs=KW
    )
    s2 = cr.curate_by_partition(
        docs, "source", str(tmp_path / "out2"), ckpt, curate_kwargs=KW
    )
    assert s1["config_hash"] != s2["config_hash"]
    assert s2["executed"] == 3 and s2["resumed"] == 0
    assert os.path.isdir(str(tmp_path / "out2" / "source=a"))


def test_stale_done_entries_not_counted(spark, docs, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    cr.curate_by_partition(docs, "source", out, ckpt, curate_kwargs=KW)
    shrunk = docs.filter(F.col("source") != "c")
    s = cr.curate_by_partition(shrunk, "source", out, ckpt,
                               curate_kwargs=KW)
    assert s["partitions"] == 2
    assert s["resumed"] == 2 and s["executed"] == 0
    assert s["by_status"] == {"done": 2}
    assert {e["partition_id"] for e in s["entries"]} == {"a", "b"}


def test_token_mode_zero_mass_group_error_is_clear(spark):
    from great_expectations_spark.functions import curation as cur_mod

    df = spark.createDataFrame(
        [(1, "real words here", "a"), (2, "   ", "b"), (3, "", "b")],
        "doc_id long, text string, source string",
    )
    with pytest.raises(ValueError, match="ZERO token mass"):
        cur_mod.mix_sample(
            df, "source", {"a": 0.5, "b": 0.5}, key_columns=["doc_id"],
            weight_by="tokens",
        )
