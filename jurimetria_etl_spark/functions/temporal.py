"""Temporal scalar functions (SURVEY §2.4 F1–F5, F7).

Timezone strategy (SURVEY §7 hard-part 1): the engine stores timestamps as
UTC instants with ``spark.sql.session.timeZone=UTC`` and applies
America/Sao_Paulo only at derivation points.  The reference instead carries
per-value tz-aware pandas Timestamps (``/root/reference/src/
jurimetria_pipeline.py:51-58``); the observable semantics (hour-of-day,
rendered strings, range-filter bounds) are identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SP_TZ = "America/Sao_Paulo"


def lenient_ts(col: Column | str) -> Column:
    """F3 — lenient ISO-8601 parse: unparseable/out-of-bounds → NULL.

    Matches the reference's ``errors="coerce"`` / OutOfBoundsDatetime→None
    behavior (``/root/reference/src/jurimetria_pipeline.py:51-58,275``).
    ``try_to_timestamp``, not ``to_timestamp``: Spark 4 defaults ANSI ON
    (and this engine never turns it off), where plain ``to_timestamp``
    ABORTS the job on the first malformed string instead of coercing.
    """
    return F.try_to_timestamp(F.col(col) if isinstance(col, str) else col)


def utc_to_sp(col: Column | str) -> Column:
    """F1 — parse an ISO UTC string and express the wall-clock in São Paulo.

    Returns a timestamp whose *naive* value is SP wall-clock time (what the
    reference's ``tz_convert("America/Sao_Paulo")`` displays).  Used at
    render/derivation points only; storage stays UTC.
    """
    return F.from_utc_timestamp(lenient_ts(col), SP_TZ)


def hour_in_sp(col: Column | str) -> Column:
    """F2 — hour-of-day of a UTC instant, evaluated in São Paulo time
    (``/root/reference/src/jurimetria_pipeline.py:274-279``)."""
    return F.hour(F.from_utc_timestamp(col, SP_TZ))


def local_date_bound_to_utc(date_str: str) -> Column:
    """F5 — interpret a CLI ``YYYY-MM-DD`` literal as SP-local midnight and
    return the corresponding UTC instant (``/root/reference/src/
    jurimetria_pipeline.py:197-199`` localizes with pytz)."""
    return F.to_utc_timestamp(F.to_timestamp(F.lit(date_str)), SP_TZ)


def reformat_br_date(col: Column | str) -> Column:
    """F4 — ``dd/mm/yyyy`` → ``yyyy-mm-dd`` (``/root/reference/legacy/
    legacy_datajud_connector.py:65-72``)."""
    # try_to_timestamp + cast, not to_date: same ANSI-coercion rationale
    # as lenient_ts — a malformed BR date must yield NULL, not abort.
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(
        F.try_to_timestamp(c, F.lit("dd/MM/yyyy")).cast("date"), "yyyy-MM-dd"
    )


def iso_render_sp(col: Column | str) -> Column:
    """F7 — render a UTC instant as an ISO-8601 string with SP offset, the
    shape ``pd.Timestamp.isoformat()`` produces in the reference's nested
    movimentos serialization (``/root/reference/src/jurimetria_pipeline.py:
    248-250``)."""
    c = F.col(col) if isinstance(col, str) else col
    local = F.from_utc_timestamp(c, SP_TZ)
    # Offset of SP at this instant, in seconds (negative west of UTC).  SP
    # abolished DST in 2019 but historical instants still shift; deriving the
    # offset from the instant itself handles both eras.
    off = F.unix_timestamp(local) - F.unix_timestamp(c)
    sign = F.when(off < 0, F.lit("-")).otherwise(F.lit("+"))
    abs_off = F.abs(off)
    hh = F.lpad(F.floor(abs_off / 3600).cast("string"), 2, "0")
    mm = F.lpad(F.floor((abs_off % 3600) / 60).cast("string"), 2, "0")
    # pd.Timestamp.isoformat() appends '.ffffff' (six digits) whenever the
    # instant has nonzero microseconds and omits it entirely otherwise —
    # match both cases, not just the whole-second one.
    frac = F.date_format(local, "SSSSSS")
    frac_part = F.when(
        frac != "000000", F.concat(F.lit("."), frac)
    ).otherwise(F.lit(""))
    return F.concat(
        F.date_format(local, "yyyy-MM-dd'T'HH:mm:ss"),
        frac_part,
        sign, hh, F.lit(":"), mm,
    )
