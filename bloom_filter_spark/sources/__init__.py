from .fixtures import token_table_path, probe_tables_path, ensure_fixtures  # noqa: F401
