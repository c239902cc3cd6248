"""Zone typing + country lookup as broadcast-join DataFrame jobs.

Reimplements:

* ``CountryFinder`` (src/country_finder.rs:18-48): a zone's country is
  the ISO3166-1:alpha2-tagged zone with the max admin_level among its
  inclusion ancestors (itself included), restricted to countries that
  have a typing rule.

* ``ZoneTyper`` (src/zone_typer.rs:80-160): three-level precedence
  1. per-osm-id override — may be an explicit NULL ("untyped", the
     libpostal way of removing a zone, zone_typer.rs:128-130);
  2. else the first inclusion container that has ``contained_by``
     sub-rules: evaluate the sub-rules' admin_level map; a sub-rule
     *miss* falls through to (3) (the ``and_then`` at
     zone_typer.rs:147-157);
  3. else the country's default admin_level map.

The reference's "first container in inclusion order" depends on R-tree
iteration order; we impose the deterministic equivalent: the most
specific container (max admin_level, then min container id).

Rules are tiny dimension tables (242 countries in libpostal) →
``F.broadcast`` on every join; the zone side is the only distributed
operand, so this scales to any zone-table size with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# sentinel for "explicitly untyped by libpostal" (override value null);
# lets us distinguish Some(None) from no-override inside coalesce logic
EXPLICIT_NONE = "__none__"

RULES_LEVELS_SCHEMA = T.StructType(
    [
        T.StructField("country", T.StringType(), False),
        T.StructField("admin_level", T.StringType(), False),
        T.StructField("zone_type", T.StringType(), False),
    ]
)
RULES_ID_SCHEMA = T.StructType(
    [
        T.StructField("country", T.StringType(), False),
        T.StructField("osm_id", T.StringType(), False),
        T.StructField("zone_type", T.StringType(), True),  # NULL = explicitly untyped
    ]
)
RULES_CONTAINED_SCHEMA = T.StructType(
    [
        T.StructField("country", T.StringType(), False),
        T.StructField("container_osm_id", T.StringType(), False),
        T.StructField("admin_level", T.StringType(), False),
        T.StructField("zone_type", T.StringType(), False),
    ]
)
# id overrides scoped to a container's sub-rules (zone_typer.rs:196-204:
# every CountryAdminTypeRules carries its own overrides.id map, and the
# contained_by recursion checks it FIRST): "inside container, zone
# osm_id types as zone_type (NULL = explicitly untyped)"
RULES_CONTAINED_ID_SCHEMA = T.StructType(
    [
        T.StructField("country", T.StringType(), False),
        T.StructField("container_osm_id", T.StringType(), False),
        T.StructField("osm_id", T.StringType(), False),
        T.StructField("zone_type", T.StringType(), True),
    ]
)
# second nesting hop (zone_typer.rs:143-157 evaluates contained_by
# RECURSIVELY; libpostal data nests at most one extra level in practice,
# so two hops cover it — deeper nests raise at parse time rather than
# silently mistype):
# "inside outer_container, zones inside inner_container type by this map"
RULES_CONTAINED2_SCHEMA = T.StructType(
    [
        T.StructField("country", T.StringType(), False),
        T.StructField("outer_container_osm_id", T.StringType(), False),
        T.StructField("inner_container_osm_id", T.StringType(), False),
        T.StructField("admin_level", T.StringType(), False),
        T.StructField("zone_type", T.StringType(), False),
    ]
)
# id overrides scoped to the INNER (second-hop) container's sub-rules
RULES_CONTAINED2_ID_SCHEMA = T.StructType(
    [
        T.StructField("country", T.StringType(), False),
        T.StructField("outer_container_osm_id", T.StringType(), False),
        T.StructField("inner_container_osm_id", T.StringType(), False),
        T.StructField("osm_id", T.StringType(), False),
        T.StructField("zone_type", T.StringType(), True),
    ]
)


# ---------------------------------------------------------------------------
# libpostal YAML rule source (S8): the reference embeds 242 country rule
# files `libpostal/resources/boundaries/osm/<cc>.yaml` at compile time
# (src/zone_typer.rs:14,162-192) with the schema
#
#     ---
#     admin_level:
#         "2": "country"
#         "9": "suburb"
#     overrides:
#         contained_by:
#             relation:
#                 "407489":
#                     admin_level:
#                         "9": "city_district"
#         id:
#             relation:
#                 "1803923": "city_district"
#                 "42": null        # explicitly untyped
#
# No YAML library ships in this environment, so a from-scratch parser of
# exactly this subset (nested mappings, quoted/bare scalars, null,
# comments) loads the same files into the three rule tables. The
# sandbox's reference checkout has an empty libpostal submodule, so
# tests drive the loader with the reference's own unit-test documents
# (zone_typer.rs:247-331) — pointed at the real folder it loads all 242
# unchanged.


def _strip_comment(line: str) -> str:
    out = []
    quote = None
    for ch in line:
        if quote:
            out.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            out.append(ch)
        elif ch == "#":
            break
        else:
            out.append(ch)
    return "".join(out)


def _yaml_scalar(tok: str):
    tok = tok.strip()
    if tok in ("null", "~", "Null", "NULL", ""):
        return None
    if len(tok) >= 2 and tok[0] == tok[-1] and tok[0] in "\"'":
        return tok[1:-1]
    return tok


def parse_mini_yaml(text: str) -> dict:
    """Parse the libpostal-rules YAML subset: nested mappings only,
    scalar string/null values, comments, optional leading ``---``.
    Raises ValueError on non-mapping lines (parity with serde_yaml
    rejecting malformed files, zone_typer.rs:277-293)."""
    root: dict = {}
    stack: list[tuple[int, dict]] = [(-1, root)]
    for raw in text.splitlines():
        line = _strip_comment(raw).rstrip()
        stripped = line.strip()
        if not stripped or stripped == "---":
            continue
        indent = len(line) - len(line.lstrip(" "))
        if "\t" in line[:indent]:
            raise ValueError(f"tab indentation not allowed: {raw!r}")
        key_part, sep, val_part = stripped.partition(":")
        if not sep:
            raise ValueError(f"not a mapping line: {raw!r}")
        key = _yaml_scalar(key_part)
        if key is None:
            raise ValueError(f"null mapping key: {raw!r}")
        while len(stack) > 1 and indent <= stack[-1][0]:
            stack.pop()
        parent = stack[-1][1]
        if val_part.strip() == "":
            node: dict = {}
            parent[key] = node
            stack.append((indent, node))
        else:
            parent[key] = _yaml_scalar(val_part)
    return root


def parse_libpostal_yaml(country: str, text: str) -> tuple[list, list, list]:
    """One country file → (levels, id_overrides, contained_by) tuples in
    the make_rules shape. ValueError on schema violations (the serde
    parity: a map where a scalar type name is required, e.g. the
    mis-indented document of zone_typer.rs:277-293)."""
    doc = parse_mini_yaml(text)
    cc = country.upper()
    levels = []
    for lvl, zt in (doc.get("admin_level") or {}).items():
        if not isinstance(zt, str):
            raise ValueError(
                f"{country}: admin_level[{lvl!r}] must be a zone type string, got {zt!r}"
            )
        levels.append((cc, str(lvl), zt))
    ovr = doc.get("overrides") or {}
    id_rules = []
    for otype, m in (ovr.get("id") or {}).items():
        for oid, zt in m.items():
            if zt is not None and not isinstance(zt, str):
                raise ValueError(f"{country}: id override {oid!r} must be scalar")
            id_rules.append((cc, f"{otype}:{oid}", zt))  # None = explicitly untyped
    contained = []
    contained2 = []
    contained_ids = []
    contained_ids2 = []
    for otype, m in (ovr.get("contained_by") or {}).items():
        for oid, sub in m.items():
            if not isinstance(sub, dict):
                raise ValueError(f"{country}: contained_by {oid!r} must be a rule map")
            outer = f"{otype}:{oid}"
            # the sub-rules' own id overrides — the recursion checks
            # these before the nested contained_by and the level map
            for otype_i, m_i in ((sub.get("overrides") or {}).get("id") or {}).items():
                for oid_i, zt in m_i.items():
                    if zt is not None and not isinstance(zt, str):
                        raise ValueError(
                            f"{country}: contained_by {oid!r} id override "
                            f"{oid_i!r} must be scalar"
                        )
                    contained_ids.append((cc, outer, f"{otype_i}:{oid_i}", zt))
            for lvl, zt in (sub.get("admin_level") or {}).items():
                if not isinstance(zt, str):
                    raise ValueError(
                        f"{country}: contained_by {oid!r} admin_level[{lvl!r}] must be scalar"
                    )
                contained.append((cc, outer, str(lvl), zt))
            # one RECURSIVE hop (zone_typer.rs:143-157): the container's
            # own contained_by sub-rules; deeper nesting is a hard parse
            # error, never a silent mistype
            for otype2, m2 in ((sub.get("overrides") or {}).get("contained_by") or {}).items():
                for oid2, sub2 in m2.items():
                    if not isinstance(sub2, dict):
                        raise ValueError(
                            f"{country}: contained_by {oid2!r} must be a rule map"
                        )
                    if (sub2.get("overrides") or {}).get("contained_by"):
                        raise ValueError(
                            f"{country}: contained_by nesting deeper than 2 "
                            "levels is not supported"
                        )
                    inner = f"{otype2}:{oid2}"
                    for otype_j, m_j in (
                        (sub2.get("overrides") or {}).get("id") or {}
                    ).items():
                        for oid_j, zt in m_j.items():
                            if zt is not None and not isinstance(zt, str):
                                raise ValueError(
                                    f"{country}: contained_by {oid2!r} id "
                                    f"override {oid_j!r} must be scalar"
                                )
                            contained_ids2.append(
                                (cc, outer, inner, f"{otype_j}:{oid_j}", zt)
                            )
                    for lvl, zt in (sub2.get("admin_level") or {}).items():
                        if not isinstance(zt, str):
                            raise ValueError(
                                f"{country}: contained_by {oid2!r} "
                                f"admin_level[{lvl!r}] must be scalar"
                            )
                        contained2.append((cc, outer, inner, str(lvl), zt))
    return levels, id_rules, contained, contained2, contained_ids, contained_ids2


def load_libpostal_rules(spark: SparkSession, folder: str) -> dict[str, DataFrame]:
    """Load a libpostal ``boundaries/osm`` folder of ``<cc>.yaml`` files
    into the rule tables (read_libpostal_yaml_folder parity,
    zone_typer.rs:162-189: unparseable files are skipped with a
    warning, the country code comes from the file stem, uppercased)."""
    import os
    import warnings

    levels: list = []
    id_rules: list = []
    contained: list = []
    contained2: list = []
    contained_ids: list = []
    contained_ids2: list = []
    for name in sorted(os.listdir(folder)):
        if not (name.endswith(".yaml") or name.endswith(".yml")):
            continue
        cc = os.path.splitext(name)[0]
        try:
            with open(os.path.join(folder, name), encoding="utf-8") as fh:
                lv, ids, cb, cb2, cbi, cbi2 = parse_libpostal_yaml(cc, fh.read())
        except ValueError as e:
            warnings.warn(f"skipping rules file {name}: {e}", stacklevel=2)
            continue
        levels.extend(lv)
        id_rules.extend(ids)
        contained.extend(cb)
        contained2.extend(cb2)
        contained_ids.extend(cbi)
        contained_ids2.extend(cbi2)
    return make_rules(
        spark, levels, id_rules, contained, contained2, contained_ids, contained_ids2
    )


def make_rules(
    spark: SparkSession,
    levels: list[tuple],
    id_overrides: list[tuple] = (),
    contained_by: list[tuple] = (),
    contained_by2: list[tuple] = (),
    contained_id_overrides: list[tuple] = (),
    contained_id_overrides2: list[tuple] = (),
) -> dict[str, DataFrame]:
    return {
        "levels": spark.createDataFrame(list(levels), RULES_LEVELS_SCHEMA),
        "id_overrides": spark.createDataFrame(list(id_overrides), RULES_ID_SCHEMA),
        "contained_by": spark.createDataFrame(list(contained_by), RULES_CONTAINED_SCHEMA),
        "contained_by2": spark.createDataFrame(
            list(contained_by2), RULES_CONTAINED2_SCHEMA
        ),
        "contained_id_overrides": spark.createDataFrame(
            list(contained_id_overrides), RULES_CONTAINED_ID_SCHEMA
        ),
        "contained_id_overrides2": spark.createDataFrame(
            list(contained_id_overrides2), RULES_CONTAINED2_ID_SCHEMA
        ),
    }


def find_countries(zones: DataFrame, rules: dict[str, DataFrame]) -> DataFrame:
    """(id, iso, country_level): zones that are countries per the
    COUNTRY_CODE_TAG + has-rule filter (country_finder.rs:18-39)."""
    rule_countries = rules["levels"].select("country").distinct()
    return (
        zones.select(
            "id",
            F.upper(F.col("tags")["ISO3166-1:alpha2"]).alias("iso"),
            F.coalesce(F.col("admin_level"), F.lit(0)).alias("country_level"),
        )
        .filter(F.col("iso").isNotNull())
        .join(F.broadcast(rule_countries), F.col("iso") == F.col("country"), "left_semi")
    )


def assign_country(
    zones: DataFrame,
    inclusions: DataFrame,
    rules: dict[str, DataFrame],
    country_code: str | None = None,
) -> DataFrame:
    """Add ``country_code``: max-admin_level country among inclusion
    ancestors ∪ self (country_finder.rs:41-48). Tie-break: max zone id
    (Rust max_by_key keeps the last maximum; self comes last).

    ``country_code`` forces the same (uppercased) code onto every zone —
    the reference's ``--country-code`` flag for extracts that carry no
    country boundary (src/lib.rs:96-107). Without it, a zone table in
    which no country zone can be found is a hard error
    (src/lib.rs:119-124): better to fail than silently emit an all-NULL
    untyped cosmogony."""
    if country_code is not None:
        return zones.withColumn("country_code", F.lit(country_code.upper()))

    countries = find_countries(zones, rules)
    if countries.isEmpty():
        raise ValueError(
            "no country_code has been provided and no country has been "
            "found, we won't be able to make a cosmogony "
            "(reference src/lib.rs:119-124)"
        )

    self_edges = zones.select(F.col("id").alias("child"), F.col("id").alias("parent"))
    edges = inclusions.select("child", "parent").unionByName(self_edges)

    matched = edges.join(
        F.broadcast(countries.withColumnRenamed("id", "parent")), "parent"
    )
    cc = matched.groupBy("child").agg(
        F.max_by("iso", F.struct(F.col("country_level"), F.col("parent"))).alias("country_code")
    )
    return zones.join(cc.withColumnRenamed("child", "id"), "id", "left")


def type_zones(zones: DataFrame, inclusions: DataFrame, rules: dict[str, DataFrame]) -> DataFrame:
    """Set ``zone_type`` by the three-level libpostal precedence.

    Input zones must already carry ``country_code`` (see assign_country).
    Zones with no country, unknown level, or an explicit-NULL override end
    with zone_type NULL (the reference's error paths → untyped,
    src/lib.rs:146-181), to be dropped by clean_untagged_zones.
    """
    lvl = F.coalesce(F.col("admin_level"), F.lit(0)).cast("string")

    # (1) id overrides — encode explicit NULL as sentinel so a later
    # coalesce can't confuse it with "no override"
    id_ov = rules["id_overrides"].select(
        F.col("country").alias("_ov_country"),
        F.col("osm_id").alias("_ov_osm_id"),
        F.coalesce(F.col("zone_type"), F.lit(EXPLICIT_NONE)).alias("_ov_type"),
    )
    z = zones.join(
        F.broadcast(id_ov),
        (F.col("country_code") == F.col("_ov_country")) & (F.col("osm_id") == F.col("_ov_osm_id")),
        "left",
    ).drop("_ov_country", "_ov_osm_id")

    # (2) contained_by: pick the most specific container that HAS
    # sub-rules, then evaluate its rule maps for this zone. A container
    # exists if ANY of its maps has entries — its level map, its own id
    # overrides, or a nested contained_by (a container with only
    # overrides.id must still be selectable, else its rules never apply)
    container_sources = [
        rules["contained_by"].select("country", "container_osm_id")
    ]
    if rules.get("contained_id_overrides") is not None:
        container_sources.append(
            rules["contained_id_overrides"].select("country", "container_osm_id")
        )
    if rules.get("contained_by2") is not None:
        container_sources.append(
            rules["contained_by2"].select(
                "country", F.col("outer_container_osm_id").alias("container_osm_id")
            )
        )
    containers_all = container_sources[0]
    for src in container_sources[1:]:
        containers_all = containers_all.unionByName(src)
    containers = (
        containers_all.select(
            F.col("country").alias("_cb_country"), "container_osm_id"
        )
        .distinct()
    )
    parent_ids = zones.select(
        F.col("id").alias("parent"),
        F.col("osm_id").alias("_p_osm_id"),
        F.coalesce(F.col("admin_level"), F.lit(0)).alias("_p_level"),
    )
    child_cc = zones.select(F.col("id").alias("child"), F.col("country_code").alias("_c_cc"))
    cand = (
        inclusions.join(parent_ids, "parent")
        .join(F.broadcast(containers), F.col("_p_osm_id") == F.col("container_osm_id"))
        .join(child_cc, "child")
        .filter(F.col("_cb_country") == F.col("_c_cc"))
    )
    chosen = cand.groupBy("child").agg(
        F.max_by(
            "container_osm_id", F.struct(F.col("_p_level"), -F.col("parent"))
        ).alias("_chosen_container")
    )
    z = z.join(chosen.withColumnRenamed("child", "id"), "id", "left")

    sub_rules = rules["contained_by"].select(
        F.col("country").alias("_sr_country"),
        F.col("container_osm_id").alias("_sr_container"),
        F.col("admin_level").alias("_sr_level"),
        F.col("zone_type").alias("_sr_type"),
    )
    z = z.join(
        F.broadcast(sub_rules),
        (F.col("country_code") == F.col("_sr_country"))
        & (F.col("_chosen_container") == F.col("_sr_container"))
        & (lvl == F.col("_sr_level")),
        "left",
    ).drop("_sr_country", "_sr_container", "_sr_level")

    # (2a') the chosen container's own id-override map — the recursion
    # (get_overrided_type of the sub-rules) checks it BEFORE the nested
    # contained_by and the level map; explicit NULL = explicitly untyped
    sub_ids = rules.get("contained_id_overrides")
    if sub_ids is not None:
        si = sub_ids.select(
            F.col("country").alias("_si_country"),
            F.col("container_osm_id").alias("_si_container"),
            F.col("osm_id").alias("_si_osm_id"),
            F.coalesce(F.col("zone_type"), F.lit(EXPLICIT_NONE)).alias("_si_type"),
        )
        z = z.join(
            F.broadcast(si),
            (F.col("country_code") == F.col("_si_country"))
            & (F.col("_chosen_container") == F.col("_si_container"))
            & (F.col("osm_id") == F.col("_si_osm_id")),
            "left",
        ).drop("_si_country", "_si_container", "_si_osm_id")
    else:
        z = z.withColumn("_si_type", F.lit(None).cast("string"))

    # (2b) second RECURSIVE hop (zone_typer.rs:143-157: get_zone_type on
    # the chosen container's rules re-enters contained_by before its
    # admin_level map): among the child's parents, the most specific one
    # carrying sub-rules NESTED under the chosen outer container
    inner_rules = rules.get("contained_by2")
    inner_ids = rules.get("contained_id_overrides2")
    if inner_rules is not None:
        # an inner container exists if EITHER of its maps has entries
        inner_keys = inner_rules.select(
            "country", "outer_container_osm_id", "inner_container_osm_id"
        )
        if inner_ids is not None:
            inner_keys = inner_keys.unionByName(
                inner_ids.select(
                    "country", "outer_container_osm_id", "inner_container_osm_id"
                )
            )
        containers2 = inner_keys.select(
            F.col("country").alias("_cb2_country"),
            F.col("outer_container_osm_id").alias("_cb2_outer"),
            F.col("inner_container_osm_id").alias("_cb2_inner"),
        ).distinct()
        parent_ids2 = zones.select(
            F.col("id").alias("parent"),
            F.col("osm_id").alias("_p2_osm_id"),
            F.coalesce(F.col("admin_level"), F.lit(0)).alias("_p2_level"),
        )
        child_cc2 = zones.select(
            F.col("id").alias("child"), F.col("country_code").alias("_c2_cc")
        )
        cand2 = (
            inclusions.join(parent_ids2, "parent")
            .join(chosen, "child")
            .join(
                F.broadcast(containers2),
                (F.col("_p2_osm_id") == F.col("_cb2_inner"))
                & (F.col("_chosen_container") == F.col("_cb2_outer")),
            )
            .join(child_cc2, "child")
            .filter(F.col("_cb2_country") == F.col("_c2_cc"))
        )
        chosen2 = cand2.groupBy("child").agg(
            F.max_by(
                "_cb2_inner", F.struct(F.col("_p2_level"), -F.col("parent"))
            ).alias("_chosen_inner")
        )
        z = z.join(chosen2.withColumnRenamed("child", "id"), "id", "left")
        sub2 = inner_rules.select(
            F.col("country").alias("_s2_country"),
            F.col("outer_container_osm_id").alias("_s2_outer"),
            F.col("inner_container_osm_id").alias("_s2_inner"),
            F.col("admin_level").alias("_s2_level"),
            F.col("zone_type").alias("_s2_type"),
        )
        z = z.join(
            F.broadcast(sub2),
            (F.col("country_code") == F.col("_s2_country"))
            & (F.col("_chosen_container") == F.col("_s2_outer"))
            & (F.col("_chosen_inner") == F.col("_s2_inner"))
            & (lvl == F.col("_s2_level")),
            "left",
        ).drop("_s2_country", "_s2_outer", "_s2_inner", "_s2_level")
        # (2b') the INNER container's own id-override map — checked by
        # the inner recursion before the inner level map
        if inner_ids is not None:
            i2 = inner_ids.select(
                F.col("country").alias("_i2_country"),
                F.col("outer_container_osm_id").alias("_i2_outer"),
                F.col("inner_container_osm_id").alias("_i2_inner"),
                F.col("osm_id").alias("_i2_osm_id"),
                F.coalesce(F.col("zone_type"), F.lit(EXPLICIT_NONE)).alias(
                    "_i2_type"
                ),
            )
            z = z.join(
                F.broadcast(i2),
                (F.col("country_code") == F.col("_i2_country"))
                & (F.col("_chosen_container") == F.col("_i2_outer"))
                & (F.col("_chosen_inner") == F.col("_i2_inner"))
                & (F.col("osm_id") == F.col("_i2_osm_id")),
                "left",
            ).drop("_i2_country", "_i2_outer", "_i2_inner", "_i2_osm_id")
        else:
            z = z.withColumn("_i2_type", F.lit(None).cast("string"))
        z = z.drop("_chosen_inner")
    else:
        z = z.withColumn("_s2_type", F.lit(None).cast("string")).withColumn(
            "_i2_type", F.lit(None).cast("string")
        )

    # (3) country default admin_level map
    defaults = rules["levels"].select(
        F.col("country").alias("_df_country"),
        F.col("admin_level").alias("_df_level"),
        F.col("zone_type").alias("_df_type"),
    )
    z = z.join(
        F.broadcast(defaults),
        (F.col("country_code") == F.col("_df_country")) & (lvl == F.col("_df_level")),
        "left",
    ).drop("_df_country", "_df_level")

    # precedence mirrors the recursion: outer id override, then within
    # the chosen container its OWN id override, then the inner
    # contained_by hop, then the container's level map, then the
    # country defaults. One asymmetry that IS the reference's behavior
    # (zone_typer.rs:151-156: the sub-rules' Option<ZoneType> result is
    # flattened with `.map(Some)`, losing the explicit-null marker): an
    # explicit-NULL id override inside a container skips the
    # container's own maps but FALLS THROUGH to the country defaults —
    # only a top-level explicit-NULL override untypes a zone outright.
    typed = (
        F.when(
            F.col("_ov_type").isNotNull(),
            F.when(F.col("_ov_type") == EXPLICIT_NONE, F.lit(None)).otherwise(
                F.col("_ov_type")
            ),
        )
        .when(
            F.col("_si_type").isNotNull(),
            F.when(F.col("_si_type") == EXPLICIT_NONE, F.col("_df_type")).otherwise(
                F.col("_si_type")
            ),
        )
        .when(
            F.col("_i2_type").isNotNull(),
            # inner explicit-NULL: the inner rules yield nothing, so the
            # sub falls past its contained_by to its OWN level map, then
            # the country defaults (same Option flattening as _si)
            F.when(
                F.col("_i2_type") == EXPLICIT_NONE,
                F.coalesce(F.col("_sr_type"), F.col("_df_type")),
            ).otherwise(F.col("_i2_type")),
        )
        .otherwise(F.coalesce(F.col("_s2_type"), F.col("_sr_type"), F.col("_df_type")))
    )

    return z.withColumn("zone_type", typed).drop(
        "_ov_type", "_si_type", "_i2_type", "_s2_type", "_sr_type", "_df_type",
        "_chosen_container",
    )


def clean_untagged_zones(zones: DataFrame) -> DataFrame:
    """Drop zones with NULL zone_type (src/lib.rs:196-201)."""
    return zones.filter(F.col("zone_type").isNotNull())


def typing_stats(typed: DataFrame) -> dict:
    """The typing counters of src/lib.rs:149-181, computed AFTER typing
    and BEFORE clean_untagged_zones drops the failures:

    * ``zone_without_country``  — zones where no country could be found
      (country_code NULL → typing impossible, src/lib.rs:151-157);
    * ``unhandled_admin_level`` — per country: counts of zones whose
      admin_level has no rule (country known, zone_type NULL,
      src/lib.rs:166-180), keyed by level (0 = missing level).

    Two tiny aggs over the broadcast-scale zone dim (one pass each)."""
    no_country = typed.filter(F.col("country_code").isNull()).count()
    rows = (
        typed.filter(F.col("country_code").isNotNull() & F.col("zone_type").isNull())
        .groupBy("country_code", F.coalesce(F.col("admin_level"), F.lit(0)).alias("lvl"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    unhandled: dict[str, dict[int, int]] = {}
    for r in rows:
        unhandled.setdefault(r["country_code"], {})[int(r["lvl"])] = int(r["n"])
    return {
        "zone_without_country": int(no_country),
        "unhandled_admin_level": unhandled,
    }
