"""Street tag projection — pure Catalyst ``when``-tree (P1-P6, F2, F10, F11).

Port of the *semantics* of /root/reference/plugins/navteq/
navteq2osm_tag_parser.hpp:391-421 (parse_street_tags) and its helpers, as a
single declarative ``select`` over the streets table: one output column per
OSM tag, NULL when the reference would not emit the tag. Everything here is
JVM-side whole-stage-codegen — no Python in this layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .strings import camel_case_udf

# speed_cat_metric table, navteq_mappings.hpp:129 (index 1..8) — exact
# reference strings, no units suffix
SPEED_CAT_METRIC = [
    ">130", "101-130", "91-100", "71-90",
    "51-70", "31-50", "11-30", "<11",
]


def _y(col_name: str) -> Column:
    """parse_bool (tag_parser:15-18): exactly 'Y' is true."""
    return F.col(col_name) == "Y"


def highway_expr() -> Column:
    """add_highway_tag decision tree (tag_parser:21-89), fixture-critical:
    route_type takes precedence; otherwise func_class with urban split;
    neither → NULL (the reference logs and emits nothing)."""
    route = F.when(F.col("ROUTE_TYPE") == "", None).otherwise(F.col("ROUTE_TYPE").cast("int"))
    func = F.when(F.col("FUNC_CLASS") == "", None).otherwise(F.col("FUNC_CLASS").cast("int"))
    urban = _y("URBAN")
    by_level = (
        F.when(route.isin(1, 2), "motorway")
        .when(route == 3, "primary")
        .when(route == 4, "secondary")
        .when(route == 5, "tertiary")
        .when(route == 6, "unclassified")
    )
    no_route = (
        F.when(func >= 4, F.when(urban, "residential").otherwise("tertiary"))
        .when(func >= 2, "secondary")
        .when(func == 1, "primary")
    )
    return F.when(route.isNull() | (route == 0), no_route).otherwise(by_level)


def oneway_expr() -> Column:
    """parse_one_way_tag (tag_parser:91-100): F→yes, T→-1, B→NULL."""
    return F.when(F.col("DIR_TRAVEL") == "F", "yes").when(F.col("DIR_TRAVEL") == "T", "-1")


def access_exprs() -> dict[str, Column]:
    """add_access_tags (tag_parser:108-122): negative flags → '=no' tags;
    access=private iff !PUB_ACCESS or PRIVATE, else destination iff !AR_TRAFF."""
    out = {
        "motorcar": F.when(~_y("AR_AUTO"), "no"),
        "bus": F.when(~_y("AR_BUS"), "no"),
        "taxi": F.when(~_y("AR_TAXIS"), "no"),
        "foot": F.when(~_y("AR_PEDEST"), "no"),
        "hgv": F.when(~_y("AR_TRUCKS"), "no"),
        "emergency": F.when(~_y("AR_EMERVEH"), "no"),
        "motorcycle": F.when(~_y("AR_MOTOR"), "no"),
        "access": F.when(~_y("PUB_ACCESS") | _y("PRIVATE"), "private").when(
            ~_y("AR_TRAFF"), "destination"
        ),
    }
    return out


def maxspeed_exprs() -> dict[str, Column]:
    """add_maxspeed_tags (tag_parser:174-211): 998 anywhere → no tags;
    999 → 'none'; forward/backward split only when both nonzero and differ.
    ≥1000 is a load-time validation error (see validate_streets)."""
    fr = F.col("FR_SPD_LIM").cast("int")
    to = F.col("TO_SPD_LIM").cast("int")
    ramp = (fr == 998) | (to == 998)
    fr_s = F.when(fr == 999, "none").otherwise(F.col("FR_SPD_LIM"))
    to_s = F.when(to == 999, "none").otherwise(F.col("TO_SPD_LIM"))
    return {
        "maxspeed": F.when(
            ~ramp,
            F.when((fr != 0) & (to != 0) & (fr == to), fr_s)
            .when((fr != 0) & (to == 0), fr_s)
            .when((fr == 0) & (to != 0), to_s),
        ),
        "maxspeed_forward": F.when(~ramp & (fr != 0) & (to != 0) & (fr != to), fr_s),
        "maxspeed_backward": F.when(~ramp & (fr != 0) & (to != 0) & (fr != to), to_s),
    }


def postcode_expr() -> Column:
    """add_postcode_tag (tag_parser:350-361): equal → one, else 'L;R',
    both empty → NULL."""
    l, r = F.col("L_POSTCODE"), F.col("R_POSTCODE")
    return F.when((l == "") & (r == ""), None).when(l == r, l).otherwise(
        F.concat_ws(";", l, r)
    )


def speed_cat_expr() -> Column:
    """add_here_speed_cat_tag (tag_parser:216-221); valid domain 1..8."""
    arr = F.array(*[F.lit(s) for s in SPEED_CAT_METRIC])
    idx = F.col("SPEED_CAT").cast("int")
    return F.when((idx > 0) & (idx <= len(SPEED_CAT_METRIC)), F.element_at(arr, idx))


def only_pedestrians_expr() -> Column:
    """tag_parser:317-327 — foot allowed, everything else denied."""
    return (
        _y("AR_PEDEST")
        & ~_y("AR_AUTO") & ~_y("AR_BUS") & ~_y("AR_EMERVEH")
        & ~_y("AR_MOTOR") & ~_y("AR_TAXIS") & ~_y("AR_TRAFF")
    )


def ferry_exprs() -> dict[str, Column]:
    """add_ferry_tag (tag_parser:331-343): B=boat, R=rail. Only applied when
    is_ferry; H rows get the highway path."""
    is_ferry = F.col("FERRY_TYPE").isin("B", "R")
    boat = F.col("FERRY_TYPE") == "B"
    ped_only = only_pedestrians_expr()
    return {
        "route": F.when(is_ferry, "ferry"),
        "railway": F.when(F.col("FERRY_TYPE") == "R", "ferry"),
        "ferry_foot": F.when(
            boat, F.when(ped_only | _y("AR_PEDEST"), "yes").otherwise("no")
        ),
        "ferry_motorcar": F.when(
            boat & ~ped_only, F.when(_y("AR_AUTO"), "yes").otherwise("no")
        ),
    }


def street_tag_columns() -> dict[str, Column]:
    """The full parse_street_tags projection (tag_parser:391-421) minus the
    conditions/country joins (A1/J4, added by operators.streets which owns
    the joins). Ferry rows suppress the highway block exactly as the
    reference's if/else does."""
    is_ferry = F.col("FERRY_TYPE").isin("B", "R")
    not_ferry = ~is_ferry

    cols: dict[str, Column] = {
        "link_id": F.col("LINK_ID"),
        "name": camel_case_udf(F.col("ST_NAME")),
    }
    cols["highway"] = F.when(not_ferry, highway_expr())
    cols["oneway"] = F.when(not_ferry, oneway_expr())
    acc = access_exprs()
    ferry = ferry_exprs()
    # foot/motorcar: highway path emits access '=no' flags; boat-ferry path
    # emits yes/no — mutually exclusive by construction.
    cols["foot"] = F.coalesce(F.when(not_ferry, acc.pop("foot")), ferry.pop("ferry_foot"))
    cols["motorcar"] = F.coalesce(
        F.when(not_ferry, acc.pop("motorcar")), ferry.pop("ferry_motorcar")
    )
    for k, v in acc.items():
        cols[k] = F.when(not_ferry, v)
    for k, v in maxspeed_exprs().items():
        cols[k] = F.when(not_ferry, v)
    cols["lanes"] = F.when(not_ferry & (F.col("PHYS_LANES") != "0"), F.col("PHYS_LANES"))
    cols["addr_postcode"] = F.when(not_ferry, postcode_expr())
    cols["surface"] = F.when(not_ferry & _y("PAVED"), "paved")
    cols["bridge"] = F.when(not_ferry & _y("BRIDGE"), "yes")
    cols["tunnel"] = F.when(not_ferry & _y("TUNNEL"), "yes")
    cols["toll"] = F.when(not_ferry & _y("TOLLWAY"), "yes")
    cols["junction"] = F.when(not_ferry & _y("ROUNDABOUT"), "roundabout")
    cols["four_wd_only"] = F.when(not_ferry & _y("FOURWHLDR"), "yes")
    for k, v in ferry.items():
        cols[k] = v
    # tags applying to both paths (tag_parser:407-419)
    cols["here_speed_cat"] = speed_cat_expr()
    cols["here_tollway"] = F.when(_y("TOLLWAY"), "yes")
    cols["here_urban"] = F.when(_y("URBAN"), "yes")
    cols["here_route_type"] = F.when(F.col("ROUTE_TYPE") != "", F.col("ROUTE_TYPE"))
    cols["here_func_class"] = F.when(F.col("FUNC_CLASS") != "", F.col("FUNC_CLASS"))
    return cols


def project_street_tags(streets: DataFrame) -> DataFrame:
    cols = street_tag_columns()
    return streets.select(*[v.alias(k) for k, v in cols.items()])
