"""Golden end-to-end pipeline test (SURVEY §5.2): miniature definition
file -> matrix -> ALS -> correlation filter -> SVM -> (sample, ±1.0)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_luad_pipeline_spark import ml, pipeline

from . import fixtures


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden")
    def_path = fixtures.write_fixture(str(root))
    return str(root), def_path


@pytest.fixture(scope="module")
def cfg(fixture_root):
    return pipeline.parse_definition_file(fixture_root[1])


@pytest.fixture(scope="module")
def bundle(spark, cfg):
    return pipeline.build_matrix(spark, cfg)


def test_parse_definition_file(cfg):
    assert cfg.samples == set(fixtures.TRAINING) | {"s0"}
    assert cfg.predictive == set(fixtures.PREDICTIVE)
    assert cfg.types == {"t1", "t2"}
    assert cfg.tumorous == {"s1", "s2", "s3"}
    assert cfg.pc_threshold == 0.95
    assert cfg.output_template.endswith("predictions_%s%.tsv")
    # last-wins: the real s1 t1 file, not the decoy (Input.scala:73)
    assert "DECOY" not in cfg.file_map[("s1", "t1")]
    # undeclared type/sample mappings exist in the raw map but are
    # filtered by eligibility (Input.scala:86,90)
    eligible = cfg.eligible_samples()
    assert "s9" not in eligible
    assert "s0" not in eligible  # declared but no files
    assert all("t3" not in files for files in eligible.values())


def test_matrix_build(bundle):
    samples = {r.name for r in bundle.sample_dict.collect()}
    assert samples == set(fixtures.SAMPLES)
    probes = {r.name for r in bundle.probe_dict.collect()}
    assert "x001" not in probes  # undeclared type's probes absent
    assert set(fixtures.T1_PROBES) <= probes
    # decoy values (1e9) must not appear anywhere (last-wins)
    assert bundle.matrix.where(F.col("value") > 1e6).count() == 0
    # header rows dropped by DROPMALFORMED
    assert bundle.matrix.where(F.col("value").isNull()).count() == 0
    n_missing = sum(
        1
        for s in fixtures.SAMPLES
        for p in fixtures.T1_PROBES + fixtures.T2_PROBES
        if fixtures.value_for(s, p) is None
    )
    expected = len(fixtures.SAMPLES) * 40 - n_missing
    assert bundle.matrix.count() == expected
    assert n_missing > 0  # the ALS path must actually trigger


def test_als_completion_fills_grid(bundle):
    completed = ml.als_complete(bundle.matrix, num_blocks=4)
    n_samples = bundle.matrix.select("sample_id").distinct().count()
    n_probes = bundle.matrix.select("probe_id").distinct().count()
    assert completed.count() == n_samples * n_probes
    # observed cells pass through untouched
    joined = completed.withColumnRenamed("value", "c").join(
        bundle.matrix, ["sample_id", "probe_id"]
    )
    assert joined.where(F.abs(F.col("c") - F.col("value")) > 1e-9).count() == 0


def test_correlation_plants(spark, bundle):
    """Planted r=±1 pairs appear; the constant probe never does."""
    probe_ids = {r.name: r.id for r in bundle.probe_dict.collect()}
    edges = ml.pearson_edges(bundle.matrix, threshold=0.95)
    got = {
        (min(r.probe_i, r.probe_j), max(r.probe_i, r.probe_j)): r.r
        for r in edges.collect()
    }

    def pair(a, b):
        return (min(probe_ids[a], probe_ids[b]), max(probe_ids[a], probe_ids[b]))

    assert got[pair("g001", "g002")] == pytest.approx(1.0)
    assert got[pair("g001", "g003")] == pytest.approx(-1.0)
    assert got[pair("m001", "m002")] == pytest.approx(1.0)
    const_id = probe_ids[fixtures.CONSTANT_PROBE]
    assert all(const_id not in p for p in got)


def test_connected_components_on_plants(spark, bundle):
    from flink_luad_pipeline_spark.operators.graph import connected_components

    probe_ids = {r.name: r.id for r in bundle.probe_dict.collect()}
    edges = ml.pearson_edges(bundle.matrix, threshold=0.95).select(
        F.col("probe_i").alias("src"), F.col("probe_j").alias("dst")
    )
    vertices = bundle.matrix.select(F.col("probe_id").alias("vertex")).distinct()
    comp = {r.vertex: r.component for r in connected_components(edges, vertices).collect()}
    # planted components merged
    assert comp[probe_ids["g001"]] == comp[probe_ids["g002"]] == comp[probe_ids["g003"]]
    assert comp[probe_ids["m001"]] == comp[probe_ids["m002"]]
    # constant probe is a singleton labeled by itself
    assert comp[probe_ids[fixtures.CONSTANT_PROBE]] == probe_ids[fixtures.CONSTANT_PROBE]
    # every vertex labeled
    assert len(comp) == len(probe_ids)


def test_end_to_end_predictions(spark, fixture_root, tmp_path):
    import glob

    preds_df = pipeline.run_pipeline(
        spark, fixture_root[1], output_token="test", als_blocks=4
    )
    preds = {r.sample: r.prediction for r in preds_df.collect()}
    # shape: exactly the predictive samples, values in {±1.0} (README.md:38)
    assert set(preds) == set(fixtures.PREDICTIVE)
    assert set(preds.values()) <= {1.0, -1.0}
    # separable plants: s7 tumorous (+1), s8 normal (-1) — beats the
    # coin-flip floor demanded by BASELINE.md
    assert preds["s7"] == 1.0
    assert preds["s8"] == -1.0
    # S5/S6: output written to the templated path
    out_files = glob.glob(f"{fixture_root[0]}/predictions_test.tsv/*.csv")
    assert out_files, "templated TSV output missing"


def test_fixedwidth_source_drops_malformed_rows(spark, tmp_path):
    """The fixed-width Python DataSource must apply the csv_io
    malformed-row convention to BOTH failure modes: short lines AND
    full-length lines whose declared-INT field is non-numeric (blank
    padding); and the widths option must fail with a clear message."""
    import pytest

    from flink_luad_pipeline_spark.sources import fixedwidth

    p = tmp_path / "fw.txt"
    p.write_text(
        "  1alpha  \n"      # good: id=1, name='alpha'
        "xxxbeta   \n"      # bad: non-numeric INT field -> dropped
        "   gamma  \n"      # bad: blank-padded INT field -> dropped
        " 12\n"             # bad: short line -> dropped
        " 42delta  \n"      # good: id=42, name='delta'
    )
    fixedwidth.register(spark)
    rows = (
        spark.read.format("fixedwidth")
        .schema("id INT, name STRING")
        .option("path", str(p))
        .option("widths", "3,7")
        .load()
        .collect()
    )
    assert sorted((r.id, r.name) for r in rows) == [(1, "alpha"), (42, "delta")]

    with pytest.raises(Exception, match="widths"):
        spark.read.format("fixedwidth").schema("id INT").option(
            "path", str(p)
        ).load().collect()
