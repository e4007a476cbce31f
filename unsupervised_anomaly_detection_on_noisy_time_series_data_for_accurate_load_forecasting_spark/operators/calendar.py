"""Calendar dimension builders (F5): weekends + public holidays.

The reference excludes French holidays and weekends from training windows
(/root/reference/src/data_processing/process_INPG.py:48-57, via the
``holidays`` library). That library is not installed here, so the builder
computes the same French national holidays directly: the fixed dates plus
the Easter-derived movable feasts via the anonymous Gregorian computus
(Gauss/Meeus algorithm — public domain math). If ``holidays`` IS available
it is used instead (import-gated), so other countries come for free.

The dim is driver-built (a few hundred rows per decade), broadcast into the
anti-join (operators: P5/P7/J3) — at 100 TB the calendar stays tiny.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def easter_sunday(year: int) -> datetime.date:
    """Gregorian Easter via the anonymous Gauss/Meeus computus."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    f = (b + 8) // 25
    g = (b - f + 1) // 3
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    el = (32 + 2 * e + 2 * i - h - k) % 7
    m = (a + 11 * h + 22 * el) // 451
    month, day = divmod(h + el - 7 * m + 114, 31)
    return datetime.date(year, month, day + 1)


def french_holidays(years: range | list[int]) -> list[tuple[datetime.date, str]]:
    """French national holidays: the set process_INPG excludes."""
    try:  # import-gated: the library wins when present (any-country support)
        import holidays as _hl

        out = []
        for y in years:
            for d, name in sorted(_hl.France(years=y).items()):
                out.append((d, name))
        return out
    except ImportError:
        pass
    out = []
    for y in years:
        easter = easter_sunday(y)
        fixed = [
            (datetime.date(y, 1, 1), "Jour de l'an"),
            (datetime.date(y, 5, 1), "Fête du Travail"),
            (datetime.date(y, 5, 8), "Victoire 1945"),
            (datetime.date(y, 7, 14), "Fête nationale"),
            (datetime.date(y, 8, 15), "Assomption"),
            (datetime.date(y, 11, 1), "Toussaint"),
            (datetime.date(y, 11, 11), "Armistice 1918"),
            (datetime.date(y, 12, 25), "Noël"),
        ]
        movable = [
            (easter + datetime.timedelta(days=1), "Lundi de Pâques"),
            (easter + datetime.timedelta(days=39), "Ascension"),
            (easter + datetime.timedelta(days=50), "Lundi de Pentecôte"),
        ]
        out.extend(sorted(fixed + movable))
    return out


def holiday_dim(spark: SparkSession, years: range | list[int]) -> DataFrame:
    """(day TIMESTAMP, holiday_name STRING) — broadcastable exclusion dim."""
    rows = [(datetime.datetime(d.year, d.month, d.day), name) for d, name in french_holidays(years)]
    return spark.createDataFrame(rows, "day timestamp, holiday_name string")


def exclusion_days(spark: SparkSession, df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """P5/F5 exclusion dim over the data's year span: weekend days present in
    the data ∪ holiday calendar days. One tiny distinct + a driver-built dim."""
    days = df.select(F.date_trunc("day", F.col(ts_col)).alias("day")).distinct()
    weekends = days.filter(F.dayofweek("day").isin(1, 7))  # Sun=1, Sat=7
    yr = df.agg(
        F.min(F.year(F.col(ts_col))).alias("lo"), F.max(F.year(F.col(ts_col))).alias("hi")
    ).collect()[0]
    hol = holiday_dim(spark, range(int(yr["lo"]), int(yr["hi"]) + 1)).select("day")
    return weekends.union(hol).distinct()
