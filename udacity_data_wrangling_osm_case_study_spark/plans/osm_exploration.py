"""SQL exploration surface over the OSM relational model (§2.9 /
§3.4): the canonical rubric queries the reference's report runs after
"import it into an SQL database, and explore the data" (README.md:5),
as Spark SQL over the views registered by ``pipeline.register_views``.

Each is plain ANSI SQL — the same strings run on any SQL engine over
the 5-table model, which is the point of the S6 sink.
"""

from __future__ import annotations

EXPLORATION_SQL: dict[str, str] = {
    # 1. table row counts
    "row_counts": """
        SELECT 'nodes' AS tbl, COUNT(*) AS n FROM nodes
        UNION ALL SELECT 'ways', COUNT(*) FROM ways
        UNION ALL SELECT 'nodes_tags', COUNT(*) FROM nodes_tags
        UNION ALL SELECT 'ways_tags', COUNT(*) FROM ways_tags
        UNION ALL SELECT 'ways_nodes', COUNT(*) FROM ways_nodes
        UNION ALL SELECT 'update_history', COUNT(*) FROM update_history
        ORDER BY tbl
    """,
    # 2. distinct contributors across nodes and ways
    "distinct_contributors": """
        SELECT COUNT(DISTINCT uid) AS n_contributors FROM (
            SELECT uid FROM nodes UNION ALL SELECT uid FROM ways
        )
    """,
    # 3. top-10 contributors
    "top_contributors": """
        SELECT user, COUNT(*) AS n FROM (
            SELECT user FROM nodes UNION ALL SELECT user FROM ways
        ) GROUP BY user ORDER BY n DESC, user LIMIT 10
    """,
    # 4. users appearing only once
    "single_appearance_users": """
        SELECT COUNT(*) AS n_single FROM (
            SELECT uid FROM (
                SELECT uid FROM nodes UNION ALL SELECT uid FROM ways
            ) GROUP BY uid HAVING COUNT(*) = 1
        )
    """,
    # 5. top amenities
    "top_amenities": """
        SELECT value, COUNT(*) AS n FROM nodes_tags
        WHERE key = 'amenity'
        GROUP BY value ORDER BY n DESC, value LIMIT 10
    """,
    # 6a. cuisines of restaurants (EAV self-join)
    "restaurant_cuisines": """
        SELECT t2.value AS cuisine, COUNT(*) AS n
        FROM nodes_tags t1
        JOIN nodes_tags t2 ON t1.id = t2.id
        WHERE t1.key = 'amenity' AND t1.value = 'restaurant'
          AND t2.key = 'cuisine'
        GROUP BY t2.value ORDER BY n DESC, cuisine
    """,
    # 6b. religions of places of worship
    "worship_religions": """
        SELECT t2.value AS religion, COUNT(*) AS n
        FROM nodes_tags t1
        JOIN nodes_tags t2 ON t1.id = t2.id
        WHERE t1.key = 'amenity' AND t1.value = 'place_of_worship'
          AND t2.key = 'religion'
        GROUP BY t2.value ORDER BY n DESC, religion
    """,
    # street-class census over ways (the P5 gate as analytics)
    "highway_census": """
        SELECT value AS highway_class, COUNT(*) AS n
        FROM ways_tags WHERE key = 'highway'
        GROUP BY value ORDER BY n DESC, highway_class LIMIT 15
    """,
    # way length distribution in node count (ways_nodes ordinal table)
    "way_size_distribution": """
        SELECT n_nodes, COUNT(*) AS n_ways FROM (
            SELECT id, COUNT(*) AS n_nodes FROM ways_nodes GROUP BY id
        ) GROUP BY n_nodes ORDER BY n_nodes LIMIT 20
    """,
    # contributions by year (F7 date surface)
    "contributions_by_year": """
        SELECT year(to_timestamp(timestamp)) AS yr, COUNT(*) AS n
        FROM (SELECT timestamp FROM nodes UNION ALL SELECT timestamp FROM ways)
        GROUP BY yr ORDER BY yr
    """,
    # what was cleaned (CDC rollup)
    "cleaning_summary": """
        SELECT element_type, field_updated, COUNT(*) AS n
        FROM update_history GROUP BY element_type, field_updated
        ORDER BY element_type, field_updated
    """,
    # longest streets by haversine length over the ordered node chain
    # (ways_nodes position ordering joined to node coordinates)
    "longest_streets": """
        WITH pts AS (
            SELECT wn.id, wn.position, n.lat, n.lon
            FROM ways_nodes wn JOIN nodes n ON wn.node_id = n.id
        ),
        segs AS (
            SELECT id,
                   lat, lon,
                   LAG(lat) OVER (PARTITION BY id ORDER BY position) AS plat,
                   LAG(lon) OVER (PARTITION BY id ORDER BY position) AS plon
            FROM pts
        ),
        lengths AS (
            SELECT id,
                   SUM(2 * 6371000 * ASIN(SQRT(
                       POWER(SIN(RADIANS(lat - plat) / 2), 2)
                       + COS(RADIANS(plat)) * COS(RADIANS(lat))
                         * POWER(SIN(RADIANS(lon - plon) / 2), 2)
                   ))) AS length_m
            FROM segs WHERE plat IS NOT NULL GROUP BY id
        )
        SELECT t.value AS name, ROUND(l.length_m, 1) AS length_m
        FROM lengths l
        JOIN ways_tags t ON t.id = l.id
           AND t.key = 'name' AND t.type = 'regular'
        JOIN ways_tags h ON h.id = l.id AND h.key = 'highway'
        ORDER BY l.length_m DESC, name LIMIT 10
    """,
}

# EXTENSION exploration over the opt-in relation tables
# (``pipeline.build_tables(..., include_relations=True)`` — the
# reference drops <relation> elements at parse_clean_and_csv.py:250).
# Kept separate from EXPLORATION_SQL because the relations views only
# exist when the extension is enabled.
RELATIONS_EXPLORATION_SQL: dict[str, str] = {
    # what kinds of relations exist (route / multipolygon / ...)
    "relation_type_census": """
        SELECT COALESCE(ty.relation_type, '(untyped)') AS relation_type,
               COUNT(*) AS n_relations
        FROM relations r
        LEFT JOIN (
            SELECT id, MIN(value) AS relation_type
            FROM relations_tags WHERE key = 'type' GROUP BY id
        ) ty ON ty.id = r.id
        GROUP BY relation_type
        ORDER BY n_relations DESC, relation_type
    """,
    # member-role census per relation type: how each relation kind is
    # assembled from nodes/ways/relations and with which roles
    "relation_member_roles": """
        SELECT COALESCE(ty.relation_type, '(untyped)') AS relation_type,
               m.member_type AS member_type,
               CASE WHEN m.role IS NULL OR m.role = '' THEN '(none)'
                    ELSE m.role END AS role,
               COUNT(*) AS n_members
        FROM relations_members m
        LEFT JOIN (
            SELECT id, MIN(value) AS relation_type
            FROM relations_tags WHERE key = 'type' GROUP BY id
        ) ty ON ty.id = m.id
        GROUP BY relation_type, member_type, role
        ORDER BY n_members DESC, relation_type, member_type, role
    """,
    # largest relations by member count, with their type and name
    "largest_relations": """
        SELECT m.id AS relation_id,
               COALESCE(ty.relation_type, '(untyped)') AS relation_type,
               nm.name AS name,
               COUNT(*) AS n_members
        FROM relations_members m
        LEFT JOIN (
            SELECT id, MIN(value) AS relation_type
            FROM relations_tags WHERE key = 'type' GROUP BY id
        ) ty ON ty.id = m.id
        LEFT JOIN (
            SELECT id, MIN(value) AS name
            FROM relations_tags WHERE key = 'name' AND type = 'regular'
            GROUP BY id
        ) nm ON nm.id = m.id
        GROUP BY relation_id, relation_type, name
        ORDER BY n_members DESC, relation_id LIMIT 10
    """,
}
