"""Source layer: partitioned JDBC, paginated REST (OAuth2), file formats,
and the pipeline-spec loader (SQL dir + column maps)."""
