from scipi_spark.sources.tables import TABLES, load_table, publications_analog

__all__ = ["TABLES", "load_table", "publications_analog"]
