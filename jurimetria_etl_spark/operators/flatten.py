"""Nested-hit flattening (SURVEY §2.3 P1–P3).

The reference flattens one hit at a time in Python (``parse_hit``,
``/root/reference/src/jurimetria_pipeline.py:163-179``).  Here the whole
flatten is a single Catalyst projection over the nested columns — no Python
in the loop, so it whole-stage-codegens and nested-schema pruning pushes the
struct field selection into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jurimetria_etl_spark.functions.temporal import SP_TZ, lenient_ts


def nomes_assuntos(col: Column | str) -> Column:
    """P2 — ``assuntos`` array<struct<nome>> → array<string>, missing name
    → ``""`` (``/root/reference/src/jurimetria_pipeline.py:61-74``).

    With the declared ``array<struct<nome:string>>`` schema the reference's
    malformed-element branches (list-in-list, scalars) collapse to the
    coalesce: schema-on-read already yields NULL for anything non-conforming.
    """
    return F.transform(col, lambda a: F.coalesce(a["nome"], F.lit("")))


def movimentos_sorted(col: Column | str) -> Column:
    """P3 — ``movimentos`` → array<struct<codigo,nome,data_hora>>, data_hora
    parsed leniently to a UTC instant, array sorted ascending by data_hora
    with NULL ordering as the epoch (``/root/reference/src/
    jurimetria_pipeline.py:77-82`` sorts with ``None`` defaulted to
    1970-01-01 America/Sao_Paulo).

    The epoch default in the reference is SP-localized 1970-01-01 00:00 (=
    1970-01-01 03:00 UTC); any real movement timestamp is far later, so
    sorting NULLs first is the observable semantic — ``array_sort`` with a
    NULLS-FIRST key struct reproduces it exactly.
    """
    parsed = F.transform(
        col,
        lambda m: F.struct(
            m["codigo"].alias("codigo"),
            m["nome"].alias("nome"),
            lenient_ts(m["dataHora"]).alias("data_hora"),
        ),
    )
    # Sort key: coalesce(ts, epoch) — NULL sorts as 1970-01-01, matching the
    # reference's `x[2] or default`.  The SECOND key field is the ORIGINAL
    # array index: the reference's Python sort is stable (equal timestamps
    # keep input order), and array_sort's struct comparison would otherwise
    # reorder ties by (codigo, nome) — an observable parity divergence in
    # the rendered movimentos.
    return F.transform(
        F.array_sort(
            F.transform(
                parsed,
                lambda m, i: F.struct(
                    F.coalesce(
                        m["data_hora"], F.to_timestamp(F.lit("1970-01-01"))
                    ).alias("k"),
                    i.alias("__i"),
                    m["codigo"].alias("codigo"),
                    m["nome"].alias("nome"),
                    m["data_hora"].alias("data_hora"),
                ),
            )
        ),
        lambda m: F.struct(
            m["codigo"].alias("codigo"),
            m["nome"].alias("nome"),
            m["data_hora"].alias("data_hora"),
        ),
    )


def flatten_hits(hits: DataFrame, tribunal: str | Column) -> DataFrame:
    """P1 — raw hit rows (HIT_SCHEMA) → 13-column flat analytic table
    (PROCESSO_SCHEMA), one declarative projection
    (``/root/reference/src/jurimetria_pipeline.py:163-179``).

    Timestamps are stored as UTC instants (session tz = UTC); the reference
    converts to SP at parse time, which this engine defers to derivation
    points (SURVEY §7 hard-part 1).
    """
    trib = F.lit(tribunal) if isinstance(tribunal, str) else tribunal
    src = F.col("_source")
    return hits.select(
        trib.alias("tribunal"),
        src["numeroProcesso"].alias("numero_processo"),
        src["classe"]["nome"].alias("classe"),
        lenient_ts(src["dataAjuizamento"]).alias("data_ajuizamento"),
        lenient_ts(src["dataHoraUltimaAtualizacao"]).alias("ultima_atualizacao"),
        src["formato"]["nome"].alias("formato"),
        src["orgaoJulgador"]["codigo"].alias("codigo_orgao"),
        src["orgaoJulgador"]["nome"].alias("orgao_julgador"),
        src["orgaoJulgador"]["codigoMunicipioIBGE"].alias("municipio"),
        src["grau"].alias("grau"),
        nomes_assuntos(F.coalesce(src["assuntos"], F.array())).alias("assuntos"),
        movimentos_sorted(
            F.coalesce(
                src["movimentos"],
                F.array().cast("array<struct<codigo:bigint,nome:string,dataHora:string>>"),
            )
        ).alias("movimentos"),
        # try_element_at: a hit carrying "sort": [] must yield NULL, not
        # abort the whole ingest under ANSI's INVALID_ARRAY_INDEX (same
        # lenient posture as temporal.lenient_ts).
        F.try_element_at(F.col("sort"), F.lit(1)).alias("sort"),
    )
