"""Element-aligned sharding of a monolithic OSM XML export.

Spark's native XML source parallelizes across FILES but does not split
WITHIN one file (verified: a 3.9 MB file stays one partition even with
a 512 KB split target). A city/planet-scale OSM export arrives as one
huge .osm — unsharded, the scan is single-task no matter how many
executors exist.

This splitter performs the same bounded-memory single pass the
reference's ``iterparse`` scan does (parse_clean_and_csv.py:168-175),
but instead of processing elements it re-emits them into N
element-aligned shard files, each a complete ``<osm>`` document. The
shard directory then scans embarrassingly parallel. OSM exports are
line-oriented (every top-level element starts on its own line), which
is what makes the boundary detection a string check rather than a
parse. At true planet scale you'd shard from the PBF form with osmium;
this utility covers the XML-in-hand case and the test rig.
"""

from __future__ import annotations

import os
import re

# A new top-level element begins (node/way/relation, any indentation).
_ELEMENT_START = re.compile(rb"^\s*<(node|way|relation)[\s/>]")

HEADER_DEFAULT = b'<?xml version="1.0" encoding="UTF-8"?>\n<osm>\n'
FOOTER = b"</osm>\n"


def split_osm_xml(
    osm_path: str, out_dir: str, target_bytes: int = 128 * 1024 * 1024
) -> list[str]:
    """Shard ``osm_path`` into element-aligned chunks of ~target_bytes.

    Returns the list of shard paths. Memory use is one line at a time;
    the pass is sequential IO at disk speed.
    """
    os.makedirs(out_dir, exist_ok=True)
    shards: list[str] = []
    header: list[bytes] = []
    header_done = False
    current = None
    current_size = 0

    def open_shard():
        nonlocal current, current_size
        path = os.path.join(out_dir, f"part-{len(shards):05d}.osm")
        shards.append(path)
        current = open(path, "wb")
        hdr = b"".join(header) if header_done and header else HEADER_DEFAULT
        current.write(hdr)
        current_size = 0

    with open(osm_path, "rb") as fh:
        for line in fh:
            if not header_done:
                if _ELEMENT_START.match(line):
                    header_done = True
                    if not header:
                        header = [HEADER_DEFAULT]
                    open_shard()
                else:
                    stripped = line.strip()
                    if stripped != b"</osm>":
                        header.append(line)
                    continue
            if line.strip() == b"</osm>":
                continue
            # only rotate shards at a top-level element boundary
            if current_size >= target_bytes and _ELEMENT_START.match(line):
                current.write(FOOTER)
                current.close()
                open_shard()
            current.write(line)
            current_size += len(line)

    if current is not None:
        current.write(FOOTER)
        current.close()
    return shards
