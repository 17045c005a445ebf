from vector_ai_npm_spark.io.sources import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
