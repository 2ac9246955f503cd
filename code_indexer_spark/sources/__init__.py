# sources: table read/write layer (parquet stand-in for Iceberg)
