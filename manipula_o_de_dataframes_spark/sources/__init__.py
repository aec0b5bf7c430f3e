from .io import (  # noqa: F401
    read_table,
    read_tables,
    read_excel,
    read_ordered_snapshots,
    preview,
    header_probe,
    write_excel,
    from_records,
)
