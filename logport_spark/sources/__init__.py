"""Input connectors — the engine's analog of logport's source side.

logport's only source is an inotify file tail (src/InotifyWatcher.cc:252-510);
here the source surface is parquet/Iceberg tables read in batch or as an
incremental stream, plus the small config/lookup tables (the SQLite
watches/settings analog, src/Database.cc:65-84).
"""

from .pages import read_pages, stream_pages
from .tables import TESTDATA_TABLES, read_lookups, read_table

__all__ = [
    "read_pages",
    "stream_pages",
    "read_table",
    "read_lookups",
    "TESTDATA_TABLES",
]
