"""addok_spark — PySpark-native full-text index + BM25 engine."""
