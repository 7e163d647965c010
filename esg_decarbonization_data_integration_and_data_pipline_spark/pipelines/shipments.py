"""Three-year shipment-plan Excel ETL (app.decarb_est_shipments).

Semantics (reference: jobs/shipments_etl.py:24-124 upload_shipment):

- the upload workbook holds FOUR side-by-side wide blocks on one
  sheet (columns A:M, O:AA, AC:AO, AQ:BC), each a site x jan..dec
  grid for base year + 0..3 (:62-72);
- header cells carry the plan metadata: B2 = version (also the base
  year), B1 = the person in charge (:50-56);
- each block is melted to (site, month, amount) (:24-31), the blocks
  are unioned with their year attached, the grand-total row (site =
  '總計') is dropped and missing amounts become 0 (:74-77);
- version/pic are stamped on every row and the
  (year, month, site, version) slice is delete-then-appended
  (:95-121) -- our ``replace_keys`` writer.

Spark shape: the melt is the no-shuffle ``unpivot`` operator; block
parsing happens driver-side on the tiny workbook (like every dim
upload) and lands as a DataFrame immediately. The xlsx byte-parsing
path reuses ``excel_source`` and is gated on openpyxl; the block
assembly is pure DataFrame code and testable without it.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.reshape import melt

BLOCK_COLS = ["A:M", "O:AA", "AC:AO", "AQ:BC"]
TOTAL_ROW = "總計"
MONTH_COLS = [str(m) for m in range(1, 13)]


def melt_shipment_block(block: DataFrame, year: int) -> DataFrame:
    """One wide site x month block -> long rows for ``year``. The
    block must carry columns site, "1".."12" (the reference renames
    positional Excel columns to these, :28)."""
    long = melt(block, ["site"], MONTH_COLS, "month", "amount")
    return (long
            .withColumn("month", F.col("month").cast("int"))
            .withColumn("year", F.lit(year)))


def assemble_shipments(blocks: list[DataFrame], version: int,
                       pic: str) -> DataFrame:
    """Union the per-offset blocks (year = version + offset), drop
    the grand-total row, zero-fill missing amounts, stamp metadata."""
    melted = [melt_shipment_block(b, version + i)
              for i, b in enumerate(blocks)]
    df = reduce(DataFrame.unionByName, melted)
    return (df
            .filter(F.col("site") != TOTAL_ROW)
            .na.fill({"amount": 0.0})
            .withColumn("version", F.lit(version))
            .withColumn("pic", F.lit(pic))
            .select("site", "month", "amount", "year", "version", "pic"))


def upload_shipments(spark: SparkSession, xlsx_path: str,
                     sheet: str = "三年計畫_出貨量") -> DataFrame:
    """Full reference path: parse header cells + four blocks from the
    workbook. Requires openpyxl (loud gate, like ``excel_source``)."""
    try:
        import openpyxl
    except ImportError as e:  # pragma: no cover - env without openpyxl
        raise NotImplementedError(
            "upload_shipments requires openpyxl; not available here") from e
    import pandas as pd

    wb = openpyxl.load_workbook(xlsx_path)
    ws = wb.active
    version = int(ws.cell(row=2, column=2).value)
    pic = str(ws.cell(row=1, column=2).value)
    wb.close()

    blocks = []
    for usecols in BLOCK_COLS:
        pdf = pd.read_excel(xlsx_path, sheet_name=sheet, usecols=usecols,
                            skiprows=4, header=None)
        pdf.columns = ["site", *MONTH_COLS]
        pdf["site"] = pdf["site"].astype(str)
        pdf[MONTH_COLS] = pdf[MONTH_COLS].astype(float)
        blocks.append(spark.createDataFrame(pdf))
    return assemble_shipments(blocks, version, pic)
