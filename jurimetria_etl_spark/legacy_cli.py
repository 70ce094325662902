"""Legacy connector CLI — K5 (SURVEY §2.2) / EP3 (SURVEY §3).

Mirrors the observable CLI surface of
``/root/reference/legacy/legacy_datajud_connector.py:154-190``:

- **argv compat shim**: if the first argument is not a known subcommand,
  ``esaj`` is inserted, so ``... --classe X`` still works (``:154-155``).
- ``esaj`` subcommand → paginated e-SAJ scrape (S6) with the reference's
  form parameters and 1 s politeness pause.
- ``datajud`` subcommand → single stats record (S7) with the
  ``tempo_julgamento``/``taxa_provimento`` metric choices.
- output: ``json.dumps(resultado, ensure_ascii=False, indent=2)`` on
  stdout (``:190``) — the K5 JSON stdout sink.

Unlike the reference, the CLI runs from ``main()`` (not at import time)
and the transports are injectable, so tests never touch the network.  No
SparkSession is needed: this surface is list-of-dicts → stdout by
definition; the DataFrame form of the same sink is
``sinks.writers.write_json_stdout``.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any

from jurimetria_etl_spark.sources.esaj import (
    HtmlTransport,
    JsonTransport,
    esaj_query,
    fetch_datajud_stats,
    fetch_esaj_rows,
    requests_html_transport,
    requests_json_transport,
)

_SUBCOMMANDS = {"esaj", "datajud", "-h", "--help"}


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("Connector e-SAJ/DataJud TJCE")
    sub = parser.add_subparsers(dest="cmd", required=True)
    parser.set_defaults(cmd="esaj")

    s1 = sub.add_parser("esaj", help="Scraping do e-SAJ")
    s1.add_argument("--classe", required=True)
    s1.add_argument("--data-inicio", default="2024-01-01")
    s1.add_argument("--data-fim")
    s1.add_argument("--max-pages", type=int)

    s2 = sub.add_parser("datajud", help="Estatísticas DataJud")
    s2.add_argument("--classe", required=True)
    s2.add_argument("--ano", type=int, required=True)
    s2.add_argument(
        "--metrica",
        choices=["tempo_julgamento", "taxa_provimento"],
        default="tempo_julgamento",
    )
    return parser


def main(
    argv: list[str] | None = None,
    html_transport: HtmlTransport | None = None,
    json_transport: JsonTransport | None = None,
    pause: float = 1.0,
) -> Any:
    argv = list(sys.argv[1:] if argv is None else argv)
    # Compat shim: insert "esaj" if no explicit subcommand was given.
    if argv and argv[0] not in _SUBCOMMANDS:
        argv.insert(0, "esaj")

    args = make_parser().parse_args(argv)

    if args.cmd == "esaj":
        resultado: Any = fetch_esaj_rows(
            html_transport or requests_html_transport,
            max_pages=args.max_pages,
            params=esaj_query(args.classe, args.data_inicio, args.data_fim),
            pause=pause,
        )
    else:
        resultado = fetch_datajud_stats(
            json_transport or requests_json_transport,
            args.classe,
            args.ano,
            args.metrica,
        )

    print(json.dumps(resultado, ensure_ascii=False, indent=2))
    return resultado


if __name__ == "__main__":
    main()
