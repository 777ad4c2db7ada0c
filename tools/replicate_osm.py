"""Test-data amplifier: replicate an OSM XML export N× with per-copy id
offsets (ids, refs, uids, changesets), preserving structure.

Used for throughput scaling experiments (README's measured crossover
table): outputs of the ETL on an N× input must be exactly N× the golden
counts, which doubles as a volume-correctness check.

Usage: python3 tools/replicate_osm.py IN.osm OUT.osm N
"""

from __future__ import annotations

import re
import sys

OFFSET = 10_000_000_000
_ID_ATTRS = re.compile(r'\b(id=|ref=|uid=|changeset=)"(\d+)"')


def replicate(in_path: str, out_path: str, copies: int) -> None:
    data = open(in_path, "rb").read().decode("utf-8")
    head, rest = data.split("<node", 1)
    body, _tail = ("<node" + rest).rsplit("</osm>", 1)
    with open(out_path, "w") as out:
        out.write(head)
        for k in range(copies):
            if k == 0:
                out.write(body)
            else:
                out.write(
                    _ID_ATTRS.sub(
                        lambda m: f'{m.group(1)}"{int(m.group(2)) + OFFSET * k}"',
                        body,
                    )
                )
        out.write("</osm>\n")


if __name__ == "__main__":
    replicate(sys.argv[1], sys.argv[2], int(sys.argv[3]))
