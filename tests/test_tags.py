"""Tag projection (P1-P6, F2, F10, F11) vs an independent row-at-a-time
Python oracle that ports parse_street_tags literally."""

from morituri_spark.functions import tags as T
from morituri_spark.functions.strings import to_camel_case_with_spaces
from morituri_spark.sources import synth


def _b(v):
    return v == "Y"


def oracle_row(r):
    """Literal row-wise port of tag_parser:391-421 and helpers."""
    out = {"link_id": r["LINK_ID"], "name": to_camel_case_with_spaces(r["ST_NAME"])}
    ferry = r["FERRY_TYPE"] in ("B", "R")
    if not ferry:
        # highway (tag_parser:21-89)
        route = int(r["ROUTE_TYPE"]) if r["ROUTE_TYPE"] else 0
        func = int(r["FUNC_CLASS"]) if r["FUNC_CLASS"] else 0
        hw = None
        if not route:
            if func >= 4:
                hw = "residential" if _b(r["URBAN"]) else "tertiary"
            elif func >= 2:
                hw = "secondary"
            elif func == 1:
                hw = "primary"
        else:
            hw = {1: "motorway", 2: "motorway", 3: "primary", 4: "secondary",
                  5: "tertiary", 6: "unclassified"}.get(route)
        out["highway"] = hw
        out["oneway"] = {"F": "yes", "T": "-1", "B": None}[r["DIR_TRAVEL"]]
        for tag, col in [("motorcar", "AR_AUTO"), ("bus", "AR_BUS"),
                         ("taxi", "AR_TAXIS"), ("foot", "AR_PEDEST"),
                         ("hgv", "AR_TRUCKS"), ("emergency", "AR_EMERVEH"),
                         ("motorcycle", "AR_MOTOR")]:
            out[tag] = None if _b(r[col]) else "no"
        if not _b(r["PUB_ACCESS"]) or _b(r["PRIVATE"]):
            out["access"] = "private"
        elif not _b(r["AR_TRAFF"]):
            out["access"] = "destination"
        else:
            out["access"] = None
        fr, to = int(r["FR_SPD_LIM"]), int(r["TO_SPD_LIM"])
        ms = msf = msb = None
        if fr != 998 and to != 998:
            frs = "none" if fr == 999 else r["FR_SPD_LIM"]
            tos = "none" if to == 999 else r["TO_SPD_LIM"]
            if fr and to:
                if fr != to:
                    msf, msb = frs, tos
                else:
                    ms = frs
            elif fr:
                ms = frs
            elif to:
                ms = tos
        out["maxspeed"], out["maxspeed_forward"], out["maxspeed_backward"] = ms, msf, msb
        out["lanes"] = r["PHYS_LANES"] if r["PHYS_LANES"] != "0" else None
        l, rr = r["L_POSTCODE"], r["R_POSTCODE"]
        out["addr_postcode"] = None if (not l and not rr) else (l if l == rr else f"{l};{rr}")
        out["surface"] = "paved" if _b(r["PAVED"]) else None
        out["bridge"] = "yes" if _b(r["BRIDGE"]) else None
        out["tunnel"] = "yes" if _b(r["TUNNEL"]) else None
        out["toll"] = "yes" if _b(r["TOLLWAY"]) else None
        out["junction"] = "roundabout" if _b(r["ROUNDABOUT"]) else None
        out["four_wd_only"] = "yes" if _b(r["FOURWHLDR"]) else None
        out["route"] = out["railway"] = None
    else:
        for k in ("highway", "oneway", "bus", "taxi", "hgv", "emergency",
                  "motorcycle", "access", "maxspeed", "maxspeed_forward",
                  "maxspeed_backward", "lanes", "addr_postcode", "surface",
                  "bridge", "tunnel", "toll", "junction", "four_wd_only"):
            out[k] = None
        out["route"] = "ferry"
        out["railway"] = "ferry" if r["FERRY_TYPE"] == "R" else None
        if r["FERRY_TYPE"] == "B":
            ped_only = (
                _b(r["AR_PEDEST"]) and not _b(r["AR_AUTO"]) and not _b(r["AR_BUS"])
                and not _b(r["AR_EMERVEH"]) and not _b(r["AR_MOTOR"])
                and not _b(r["AR_TAXIS"]) and not _b(r["AR_TRAFF"])
            )
            if ped_only:
                out["foot"], out["motorcar"] = "yes", None
            else:
                out["foot"] = "yes" if _b(r["AR_PEDEST"]) else "no"
                out["motorcar"] = "yes" if _b(r["AR_AUTO"]) else "no"
        else:
            out["foot"] = out["motorcar"] = None
    sc = int(r["SPEED_CAT"])
    out["here_speed_cat"] = T.SPEED_CAT_METRIC[sc - 1] if 0 < sc <= 8 else None
    out["here_tollway"] = "yes" if _b(r["TOLLWAY"]) else None
    out["here_urban"] = "yes" if _b(r["URBAN"]) else None
    out["here_route_type"] = r["ROUTE_TYPE"] or None
    out["here_func_class"] = r["FUNC_CLASS"] or None
    return out


def test_tag_projection_matches_row_oracle(spark):
    streets = synth.streets_table(spark, n=300)
    got = {r["link_id"]: r.asDict() for r in T.project_street_tags(streets).collect()}
    src = [r.asDict() for r in streets.collect()]
    assert len(got) == 300
    for r in src:
        want = oracle_row(r)
        have = got[r["LINK_ID"]]
        for k, v in want.items():
            assert have[k] == v, f"link {r['LINK_ID']} tag {k}: spark={have[k]!r} oracle={v!r} row={r}"


def test_highway_decision_tree_edges(spark):
    import pandas as pd

    cases = [
        # (ROUTE_TYPE, FUNC_CLASS, URBAN) -> highway
        ("", "4", "Y", "residential"),
        ("", "4", "N", "tertiary"),
        ("", "5", "Y", "residential"),
        ("", "2", "Y", "secondary"),
        ("", "3", "N", "secondary"),
        ("", "1", "Y", "primary"),
        ("1", "5", "N", "motorway"),   # route_type wins
        ("2", "", "N", "motorway"),
        ("3", "", "N", "primary"),
        ("4", "", "N", "secondary"),
        ("5", "", "N", "tertiary"),
        ("6", "", "N", "unclassified"),
        ("", "", "N", None),            # neither → no tag
    ]
    pdf = pd.DataFrame(
        [{"ROUTE_TYPE": a, "FUNC_CLASS": b, "URBAN": c} for a, b, c, _ in cases]
    )
    df = spark.createDataFrame(pdf)
    got = [r[0] for r in df.select(T.highway_expr()).collect()]
    assert got == [w for _, _, _, w in cases]
