from .registry import FILES_CTE_SQL, files_view, load_table  # noqa: F401
