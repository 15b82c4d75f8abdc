"""SQL entry point: statement guards, dialect translation, execution."""

from .sql import clean_generated_sql, execute_sql, translate_dialect

__all__ = ["clean_generated_sql", "execute_sql", "translate_dialect"]
