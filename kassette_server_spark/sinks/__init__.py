"""Sink implementations: REST destination shapes (PowerBI/Anaplan/Keen),
JDBC/warehouse DDL, S3/parquet, delivery-ledger writers."""
