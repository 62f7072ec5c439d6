"""Reference-parity pipelines: the six jobs of
milanhub007/BigData-Processing re-expressed as engine compositions over
the reference's REAL input schemas (15-col transactions.csv, 6-col
contracts.csv, 19-col blocks.csv, scams.json). A reference user points
these at their data and gets the same outputs — from declarative
DataFrame plans instead of RDD lambdas."""

from bigdata_processing_spark.pipelines.ethereum import (  # noqa: F401
    data_overhead,
    gas_guzzlers,
    monthly_transactions,
    scam_analysis,
    top10_contracts,
    top10_miners,
)
