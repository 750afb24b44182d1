"""Codec tests (SURVEY §5.2.3/4): golden bytes for the fixed-width
writer, round-trips for CSV/fixed-width/inline-base64, header/footer
broadcast semantics per FIXTURES.md B1/B2/B6."""

from __future__ import annotations

import base64
import glob

import pytest
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.sinks.writers import (
    FWOutColumn,
    render_fixed_width_lines,
    write_fixed_width,
)
from cubicerp_client_etl_spark.sources.csv_source import read_csv_resource
from cubicerp_client_etl_spark.sources.fixed_width import FWColumn, read_fixed_width
from cubicerp_client_etl_spark.sources.inline import read_inline_payload
from cubicerp_client_etl_spark.sources.lines import read_lines

NATION_ROWS = [(0, "ALGERIA", 0), (1, "ARGENTINA", 1), (24, "UNITED STATES", 1)]

# FIXTURES.md B2 layout: rjust-0 key, ljust name, rjust-0 regionkey,
# centered forced tag with '-' fill
FW_OUT = [
    FWOutColumn("n_nationkey", 4, "rjust", "0"),
    FWOutColumn("n_name", 20, "ljust", " "),
    FWOutColumn("n_regionkey", 2, "rjust", "0"),
    FWOutColumn("forced_tag", 3, "center", "-", forced_value="X"),
]
FW_IN = [
    FWColumn("n_nationkey", 1, 4),
    FWColumn("n_name", 5, 20),
    FWColumn("n_regionkey", 25, 2),
    FWColumn("forced_tag", 27, 3, strip=False),
]


@pytest.fixture()
def nation_df(spark):
    return spark.createDataFrame(
        NATION_ROWS, "n_nationkey int, n_name string, n_regionkey int"
    )


def test_fixed_width_golden_bytes(nation_df):
    lines = [
        r["value"]
        for r in render_fixed_width_lines(nation_df, FW_OUT).collect()
    ]
    # golden: matches python f"{key:0>4}{name:<20}{rk:0>2}{'X':-^3}"
    assert lines[0] == "0000ALGERIA             00-X-"
    assert lines[1] == "0001ARGENTINA           01-X-"
    assert lines[2] == "0024UNITED STATES       01-X-"
    assert all(len(ln) == 29 for ln in lines)


def test_fw_render_matches_python_semantics(spark):
    # property-style check against str.ljust/rjust/center + truncation
    cases = [
        ("abc", 5, "ljust", "."), ("abc", 5, "rjust", "."),
        ("abc", 5, "center", "."), ("abcdefgh", 5, "ljust", "."),
        ("abcdefgh", 5, "rjust", "."), ("abcdefgh", 5, "center", "."),
        ("", 4, "center", "-"), ("ab", 7, "center", "-"),
    ]
    df = spark.createDataFrame([(s,) for s, *_ in cases], "v string")
    for s, ln, align, fill in cases:
        got = (
            spark.createDataFrame([(s,)], "v string")
            .select(
                __import__(
                    "cubicerp_client_etl_spark.functions", fromlist=["fw_render"]
                ).fw_render(F.col("v"), ln, align, fill)
            )
            .collect()[0][0]
        )
        if align == "ljust":
            want = s.ljust(ln, fill)[:ln]
        elif align == "rjust":
            # reference quirk: rjust overflow keeps the LAST n chars
            want = s.rjust(ln, fill) if len(s) <= ln else s[-ln:]
        else:
            want = s.center(ln, fill)[:ln]
        assert got == want, (s, ln, align, fill, got, want)


def test_fixed_width_roundtrip_with_header_footer(spark, nation_df, tmp_path):
    out = str(tmp_path / "fw")
    write_fixed_width(
        nation_df,
        out,
        FW_OUT,
        order_by=["n_nationkey"],
        header_line="H2024010599",
        footer_line="F0000000003",
    )
    files = glob.glob(f"{out}/part-*")
    assert len(files) == 1, "header/footer mode must emit a single file"
    raw = open(files[0]).read().rstrip("\n").split("\n")
    assert raw[0] == "H2024010599" and raw[-1] == "F0000000003"

    hdr = [FWColumn("h_tag", 1, 1), FWColumn("h_date", 2, 8), FWColumn("h_batch", 10, 2)]
    ftr = [FWColumn("f_tag", 1, 1), FWColumn("f_count", 2, 10)]
    back = read_fixed_width(
        spark, out, FW_IN, header_columns=hdr, footer_columns=ftr
    ).orderBy("n_nationkey")
    rows = back.collect()
    assert len(rows) == 3  # header/footer excluded from body
    assert [int(r["n_nationkey"]) for r in rows] == [0, 1, 24]
    assert rows[0]["n_name"] == "ALGERIA"
    assert rows[0]["forced_tag"] == "-X-"
    # header/footer values broadcast onto every body row (FIXTURES B1)
    assert all(r["h_date"] == "20240105" and r["h_batch"] == "99" for r in rows)
    assert all(int(r["f_count"]) == 3 for r in rows)


def test_csv_header_footer_broadcast(spark, tmp_path):
    p = tmp_path / "hf.csv"
    p.write_text(
        "2024-01-05;42\n"
        '0;"ALGERIA";0\n'
        '1;"ARG;ENTINA";1\n'  # separator inside quotes
        "3;5340.25\n"
    )
    df = read_csv_resource(
        spark,
        str(p),
        ["n_nationkey", "n_name", "n_regionkey"],
        sep=";",
        quote='"',
        header_columns=["file_date", "batch_no"],
        footer_columns=["row_count", "total_amount"],
    ).orderBy("_line_no")
    rows = df.collect()
    assert len(rows) == 2
    assert rows[1]["n_name"] == "ARG;ENTINA"
    assert all(r["file_date"] == "2024-01-05" and r["batch_no"] == "42" for r in rows)
    assert all(r["total_amount"] == "5340.25" for r in rows)


def test_inline_base64_equals_file_parse(spark, tmp_path):
    content = "a;1\nb;2\nc;3\n"
    p = tmp_path / "plain.csv"
    p.write_text(content)
    via_file = read_lines(spark, str(p)).select("_line_no", "value").collect()
    payload = base64.b64encode(content.encode()).decode()
    via_inline = (
        read_inline_payload(spark, payload).select("_line_no", "value").collect()
    )
    assert sorted(map(tuple, via_file)) == sorted(map(tuple, via_inline))


def test_csv_plain_path_roundtrip(spark, tmp_path, nation_df):
    from cubicerp_client_etl_spark.sinks.writers import write_csv_resource

    out = str(tmp_path / "csv")
    write_csv_resource(nation_df, out, sep="|")
    back = (
        spark.read.csv(out, sep="|")
        .toDF("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    )
    assert [(int(r[0]), r[1], int(r[2])) for r in back] == NATION_ROWS


# --------------------------------------------------------------------------
# DBF round-trip (SURVEY A5/I5): built-in dBase III writer → built-in
# reader, covering C/N/L/D types, nulls, and deleted-record skip.
# --------------------------------------------------------------------------
def test_dbf_roundtrip(spark, tmp_path):
    from cubicerp_client_etl_spark.sinks.dbf import DbfField, write_dbf
    from cubicerp_client_etl_spark.sources.dbf import read_dbf

    df = spark.createDataFrame(
        [
            (0, "ALGERIA", 4.5, True, "2024-01-31"),
            (1, "ARGENTINA", None, False, None),
            (24, None, -12.25, None, "1999-12-31"),
        ],
        "k bigint, name string, score double, flag boolean, d string",
    )
    path = str(tmp_path / "out.dbf")
    specs = [
        DbfField("k", "N", 19, 0),
        DbfField("name", "C", 20, 0),
        DbfField("score", "N", 12, 2),
        DbfField("flag", "L", 1, 0),
        DbfField("d", "D", 8, 0),
    ]
    n = write_dbf(df, path, specs)
    assert n == 3

    back = read_dbf(
        spark, path, schema="k bigint, name string, score double, flag boolean, d string"
    )
    got = {r["k"]: r for r in back.collect()}
    assert set(got) == {0, 1, 24}
    assert got[0]["name"] == "ALGERIA" and got[0]["flag"] is True
    assert got[0]["d"] == "2024-01-31"
    assert got[1]["score"] is None and got[1]["flag"] is False and got[1]["d"] is None
    assert got[24]["name"] is None and got[24]["score"] == -12.25
    assert got[24]["flag"] is None


def test_dbf_inferred_specs_roundtrip(spark, tmp_path):
    from cubicerp_client_etl_spark.sinks.dbf import write_dbf
    from cubicerp_client_etl_spark.sources.dbf import read_dbf

    nation = spark.createDataFrame(
        NATION_ROWS, "n_nationkey int, n_name string, n_regionkey int"
    )
    path = str(tmp_path / "nation.dbf")
    assert write_dbf(nation, path) == 3
    back = read_dbf(spark, path)  # schema inferred from the file header
    rows = sorted((int(r[0]), r[1], int(r[2])) for r in back.collect())
    assert rows == sorted(NATION_ROWS)


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from cubicerp_client_etl_spark.sources.jsonl import (
        quarantine,
        read_jsonl,
        write_jsonl,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("text", StringType(), True),
        ]
    )
    df = spark.createDataFrame(
        [(1, "hello"), (2, None), (3, 'quote " and , comma')], schema
    )
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(df, out)
    back, bad = quarantine(read_jsonl(spark, out, schema=schema))
    assert bad.count() == 0
    assert sorted((r.doc_id, r.text) for r in back.collect()) == [
        (1, "hello"),
        (2, None),
        (3, 'quote " and , comma'),
    ]

    # malformed line goes to quarantine, good lines survive
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\n{not json at all\n')
    good, bad = quarantine(read_jsonl(spark, str(p), schema=schema))
    assert [(r.doc_id, r.text) for r in good.collect()] == [(1, "ok")]
    assert bad.count() == 1


def test_compact_parquet_small_files(spark, tmp_path):
    from cubicerp_client_etl_spark.sinks.writers import compact_parquet

    src = str(tmp_path / "fragmented")
    # simulate the small-files problem: 64 shards of a 1000-row table
    spark.range(1000).withColumnRenamed("id", "k").repartition(64).write.parquet(src)
    dst = str(tmp_path / "compacted")
    n_files = compact_parquet(
        spark, src, dst, target_rows_per_file=500, sort_within_by=["k"]
    )
    assert n_files == 2
    back = spark.read.parquet(dst)
    assert back.count() == 1000
    assert sorted(r.k for r in back.collect()) == list(range(1000))


def test_write_clustered_disjoint_file_ranges(spark, tmp_path):
    """I8/L-scale: range-clustered layout must give files pairwise
    disjoint cluster-key ranges (verified from Parquet footer stats) —
    the property that makes min/max file pruning effective."""
    import glob

    import pyarrow.parquet as pq

    from cubicerp_client_etl_spark.sinks.writers import write_clustered
    from tests.conftest import SF_SMOKE

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    dst = str(tmp_path / "clustered")
    write_clustered(li, dst, ["l_orderkey"], n_files=4)

    ranges = []
    for f in sorted(glob.glob(f"{dst}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # l_orderkey
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 4
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, f"overlapping file ranges: {ranges}"


def test_zorder_key_interleaves_bits(spark):
    from cubicerp_client_etl_spark.sinks.writers import zorder_key

    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    z = df.select(zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")).collect()[0]["z"]
    # x bits (1,0,1) land at even positions, y bits (1,1,0) at odd:
    # bit0=x0=1, bit1=y0=1, bit2=x1=0, bit3=y1=1, bit4=x2=1, bit5=y2=0
    # MSB-first that is 0b011011
    assert z == 0b011011


def test_zorder_key_rejects_over_budget_bits(spark):
    """ADVICE r2: bits*len(cols) > 63 reaches the int64 sign bit and
    Java's shift-mod-64 wraparound — must raise, not silently scramble
    the Morton ordering. write_zorder clamps instead (quality knob)."""
    import warnings

    import pytest as _pytest

    from cubicerp_client_etl_spark.sinks.writers import write_zorder, zorder_key

    cols = [F.col(c) for c in ("a", "b", "c", "d")]
    with _pytest.raises(ValueError, match="63"):
        zorder_key(cols, bits=16)  # 16*4 = 64 > 63
    assert zorder_key(cols, bits=15) is not None  # 60 <= 63 ok

    df = spark.createDataFrame([(1, 2, 3, 4)], "a long, b long, c long, d long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            write_zorder(df, f"{tmp}/z", ["a", "b", "c", "d"], bits=16)
    assert any("clamping bits" in str(w.message) for w in caught)


def test_write_zorder_prunes_both_columns(spark, tmp_path):
    """L-scale: z-order layout must give BOTH z-ordered columns
    non-trivial per-file ranges — a selective predicate on either
    column can skip files (range clustering only achieves this for the
    leading key)."""
    import glob

    import pyarrow.parquet as pq

    from cubicerp_client_etl_spark.sinks.writers import write_zorder

    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    dst = str(tmp_path / "zordered")
    write_zorder(df, dst, ["x", "y"], n_files=16, bits=6)

    files = sorted(glob.glob(f"{dst}/part-*.parquet"))
    assert len(files) == 16

    def spans(col_idx):
        out = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return out

    # average per-file span on EACH column must be well under the full
    # domain (64) — i.e. both columns are clustered, not just one
    for ci in (0, 1):
        sp = spans(ci)
        avg_span = sum(hi - lo for lo, hi in sp) / len(sp)
        assert avg_span <= 32, (ci, sp)
