"""URL/file-path normalization (reference operators P3-P9,
reference src/common_package/file_path_tasks.py:55-99).

Exact observable semantics, as codegen'd expressions:

1. lowercase the whole path
2. split at the LAST '/' -> (directory, name)   [os.path.split]
3. truncate name at the first '+++', then '"', then '?' (sequential)
4. strip chars not in [a-zA-Z0-9./\\-'+_]
5. extension = os.path.splitext(name)[1]; extensions containing '+' -> ''
   (splitext: last '.'-suffix, but NOT if every char before the last
   dot is itself a dot — '.hidden', '..txt' have no extension)
6. rebuilt path = dir + '/' + name (no double slash)
7. file_type = 'directory' if extension == '' else 'file'
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BAD_CHARS = r"[^a-zA-Z0-9./\-'+_]"
# a real splitext extension: some non-dot exists before the last dot
EXT_VALID = r"[^.].*\.[^.]*$"
EXT_CAPTURE = r"(\.[^.]*)$"


def _split_dir(p: F.Column) -> F.Column:
    # os.path.split dir: '' when no '/', '/' for root files, else up to last '/'
    return F.when(~p.contains("/"), F.lit("")).otherwise(
        F.when(F.regexp_extract(p, r"^(.*)/[^/]*$", 1) == "", F.lit("/")).otherwise(
            F.regexp_extract(p, r"^(.*)/[^/]*$", 1)
        )
    )


def normalize_path(df: DataFrame, col: str = "raw_file_path") -> DataFrame:
    low = F.lower(F.col(col))
    name0 = F.when(~low.contains("/"), low).otherwise(F.regexp_extract(low, r"([^/]*)$", 1))
    d = _split_dir(low)
    # sequential truncations: '+++' then '"' then '?' (order is observable)
    name1 = F.split(name0, r"\+\+\+", 2)[0]
    name2 = F.split(name1, '"', 2)[0]
    name3 = F.split(name2, r"\?", 2)[0]
    name = F.regexp_replace(name3, BAD_CHARS, "")
    ext_raw = F.when(name.rlike(EXT_VALID), F.regexp_extract(name, EXT_CAPTURE, 1)).otherwise(
        F.lit("")
    )
    ext = F.when(ext_raw.contains("+"), F.lit("")).otherwise(ext_raw)
    path = F.when(d.endswith("/"), F.concat(d, name)).otherwise(F.concat(d, F.lit("/"), name))
    return (
        df.withColumn("file_directory", d)
        .withColumn("file_name", name)
        .withColumn("file_extension", ext)
        .withColumn("file_path", path)
        .withColumn("file_type", F.when(ext == "", "directory").otherwise("file"))
    )


def process_file_path_py(raw: str) -> tuple[str, str, str, str, str]:
    """Pure-Python twin of ``normalize_path`` (unit-test oracle)."""
    import os
    import re

    raw = raw.lower()
    d, name = os.path.split(raw)
    for marker in ("+++", '"', "?"):
        if marker in name:
            name = name[: name.find(marker)]
    name = re.sub(BAD_CHARS, "", name)
    _, ext = os.path.splitext(name)
    if "+" in ext:
        ext = ""
    path = f"{d}{name}" if d.endswith("/") else f"{d}/{name}"
    return (path, d, name, ext, "directory" if ext == "" else "file")
