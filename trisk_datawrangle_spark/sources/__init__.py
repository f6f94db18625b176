from trisk_datawrangle_spark.sources.readers import (  # noqa: F401
    TABLES,
    load_tables,
    read_csv_typed,
    read_excel_sheet,
    register_views,
    write_output,
)
