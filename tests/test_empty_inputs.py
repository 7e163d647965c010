"""Empty-input robustness: a month with no data must flow through
the pipelines as empty frames with stable schemas, not crash."""

from __future__ import annotations

import datetime as dt

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.dedup import (
    minhash_band_pairs,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.electricity_decarb import (
    electricity_decarb,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.electric_bill_split import (
    split_bill_tables,
)

RUN = dt.date(2023, 12, 1)


def test_electricity_decarb_empty_solar(spark):
    elec = spark.createDataFrame(
        [("WZS", 100.0, dt.date(2023, 1, 1))],
        "site string, amount double, period_start date")
    solar = spark.createDataFrame([], "site string, amount double, period_start date")
    mapping = spark.createDataFrame([("WZS", "BO1")], "site string, bo string")
    out = electricity_decarb(
        {"electricity_total": elec, "solar": solar, "plant_mapping": mapping}, RUN)
    rows = {(r.bo, r.site): r.amount for r in out.collect()}
    assert rows[("BO1", "WZS")] == 100.0  # grid-only still flows


def test_bill_split_all_empty(spark):
    bill = spark.createDataFrame(
        [], "meter_code string, category1 string, category2 string, "
            "amount double, year int, month int")
    meter = spark.createDataFrame(
        [], "meter_code string, site string, plant string, provider_name string")
    out = split_bill_tables({"electric_bill": bill, "meter_dim": meter})
    for name, df in out.items():
        assert df.count() == 0
        assert "ytm_amount" in df.columns  # schema intact


def test_minhash_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_band_pairs(docs).count() == 0


def test_r5_text_ops_empty_corpus(spark):
    """The round-5 text operators must return empty frames with
    stable schemas on an empty corpus."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        char_entropy, decontaminate_flags, ngram_doc_freq, scrub_pii,
    )

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert ngram_doc_freq(empty).count() == 0
    assert decontaminate_flags(empty, empty).count() == 0
    assert char_entropy(empty).count() == 0
    out = scrub_pii(empty)
    assert out.count() == 0
    # one count per rule of the unified pii.PII_RULES table (r9)
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.pii import PII_RULES
    assert out.columns == ["doc_id", "clean_text"] + [
        f"n_{kind}" for kind, _p, _t in PII_RULES]


def test_r6_export_tier_empty_corpus(spark):
    """The round-6 export-tier operators must return empty frames
    with stable schemas on an empty corpus."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.bpe import (
        bpe_segment, train_bpe,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.diff import dataset_diff
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.packing import (
        pack_manifest, pack_sequences,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        token_budget_by_source, token_budget_sample, top_fraction_by_score,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        drop_repeated_lines, gopher_rules,
    )

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    packed = pack_sequences(empty, seq_len=16, n_shards=2)
    assert packed.count() == 0
    assert pack_manifest(packed, 16).count() == 0
    assert token_budget_sample(empty, 100).count() == 0
    assert token_budget_by_source(
        empty.withColumn("source", empty.doc_id.cast("string")),
        {"s": 10}).count() == 0
    assert gopher_rules(empty).count() == 0
    lines = spark.createDataFrame(
        [], "doc_id bigint, chunk_idx int, chunk_text string")
    assert drop_repeated_lines(lines).count() == 0
    assert dataset_diff(empty, empty).count() == 0
    scored = spark.createDataFrame([], "doc_id bigint, score double")
    assert top_fraction_by_score(scored, "score", 0.5).count() == 0
    assert train_bpe(empty, n_merges=3) == []
    assert bpe_segment(empty, [("a", "b")]).count() == 0


def test_r6_sources_empty_inputs(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.corpus_files import (
        read_jsonl_corpus,
    )

    p = tmp_path / "empty.jsonl"
    p.write_text("\n\n")   # only blank lines
    docs, q = read_jsonl_corpus(spark, str(p))
    assert docs.count() == 0 and q.count() == 0
