from mini_hadoop_spark.sources.catalog import TABLES, load_table, register_views, table_path

__all__ = ["TABLES", "load_table", "register_views", "table_path"]
