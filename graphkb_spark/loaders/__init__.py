"""Loader pipelines: the reference's per-source ETL modules re-expressed
as batch DataFrame pipelines over the KB tables (SURVEY §7.3-§7.6)."""
