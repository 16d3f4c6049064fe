"""Engine facade — the one-import entry point for a user switching
from the reference.

    from kassette_server_spark.engine import Engine

    eng = Engine(sf_dir="/root/testdata/sf0.01")
    eng.sql("SELECT count(*) FROM lineitem").show()
    eng.table("orders").groupBy("o_orderstatus").count().show()
    eng.query("q08_agg_having").show()          # any declared operator
    eng.run_pipeline(connection, input_df)      # batch pipeline

Thin by design: the SQL surface IS Spark SQL over the registered
catalog (Catalyst does the optimization), and every named operator in
queries/ is callable by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import catalog, pipeline as P
from .config import Connection
from .queries import all_specs
from .session import get_spark


class Engine:
    def __init__(self, sf_dir: str = catalog.DEFAULT_SF_DIR, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        catalog.register(self.spark, sf_dir)

    def sql(self, text: str) -> DataFrame:
        return self.spark.sql(text)

    def table(self, name: str) -> DataFrame:
        return catalog.load(self.spark, self.sf_dir, name)

    def query(self, name: str) -> DataFrame:
        """Run a declared operator query by registry name."""
        return all_specs()[name].fn(self.spark, self.sf_dir)

    def queries(self) -> list[str]:
        return sorted(all_specs())

    def run_pipeline(self, conn: Connection, raw: DataFrame, clock=None) -> DataFrame:
        """Batch-run the full kassette pipeline for one connection over
        a DataFrame with a ``payload`` envelope column."""
        parsed = P.parse_envelope(raw)
        ident = P.synthesize_identity(parsed)
        skewed = P.correct_timestamp_skew(ident, clock=clock)
        return P.transform_for_connection(skewed, conn)
