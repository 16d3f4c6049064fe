"""Sink implementations: REST destination shapes (PowerBI/Anaplan/Keen),
JDBC/warehouse DDL, Postgres COPY bulk path, S3/parquet,
delivery-ledger writers."""
