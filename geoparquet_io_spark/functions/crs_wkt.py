"""Full OGC WKT1 generation for the EPSG codes this engine projects.

The shapefile ``.prj`` and GeoPackage ``gpkg_spatial_ref_sys.definition``
sinks previously wrote a minimal AUTHORITY-only stub for anything but
WGS 84 — enough for this engine's own reader (which keys on the last
AUTHORITY clause) but not for external consumers that parse the WKT
body.  This module assembles a complete ``PROJCS[...]`` / ``GEOGCS[...]``
string from the same projection parameters the numpy transform kernels
in functions/projections.py use, so the written text and the executed
math can never disagree.

Reference behavior: geoparquet-io delegates CRS text to GDAL/PROJ
(core/convert.py ST_Read pipeline carries the PROJ database's WKT);
this engine has no GDAL, so the WKT is synthesized from first
principles.  Parameter names follow OGC 01-009 as emitted by GDAL's
WKT1 writer (Transverse_Mercator / Lambert_Conformal_Conic_2SP / ...).

Where the EPSG registry identity of an *inner* object (datum code of a
regional frame, say) is not tracked by this engine, the inner AUTHORITY
clause is simply omitted — WKT1 allows that, and every consumer keys on
names + numeric parameters + the outer AUTHORITY, all of which are
exact here.
"""

from __future__ import annotations

from geoparquet_io_spark.functions import projections as P

# geographic CRS building blocks: key -> (geogcs_name, datum_name,
#   spheroid_name, (a, 1/f), spheroid_epsg, geogcs_epsg, towgs84 or None)
# towgs84 is (dx, dy, dz, rx, ry, rz, ds) position-vector arcsec/ppm.
_ZERO7 = (0.0,) * 7
_GEOGCS: dict[str, tuple] = {
    "WGS84": ("WGS 84", "WGS_1984", "WGS 84", P.WGS84, 7030, 4326, None),
    "ETRS89": ("ETRS89", "European_Terrestrial_Reference_System_1989",
               "GRS 1980", P.GRS80, 7019, 4258, _ZERO7),
    "NAD83": ("NAD83", "North_American_Datum_1983",
              "GRS 1980", P.GRS80, 7019, 4269, _ZERO7),
    "GDA94": ("GDA94", "Geocentric_Datum_of_Australia_1994",
              "GRS 1980", P.GRS80, 7019, 4283, _ZERO7),
    "RGF93": ("RGF93 v1", "Reseau_Geodesique_Francais_1993_v1",
              "GRS 1980", P.GRS80, 7019, 4171, _ZERO7),
    "SWEREF99": ("SWEREF99", "SWEREF99", "GRS 1980", P.GRS80, 7019, 4619,
                 _ZERO7),
    "NZGD2000": ("NZGD2000", "New_Zealand_Geodetic_Datum_2000",
                 "GRS 1980", P.GRS80, 7019, 4167, _ZERO7),
    "TWD97": ("TWD97", "Taiwan_Datum_1997", "GRS 1980", P.GRS80, 7019, 3824,
              _ZERO7),
    "D96": ("Slovenia 1996", "Slovenia_Geodetic_Datum_1996",
            "GRS 1980", P.GRS80, 7019, 4765, _ZERO7),
    "LKS94": ("LKS94", "Lithuania_1994_ETRS89", "GRS 1980", P.GRS80, 7019,
              4669, _ZERO7),
    "HTRS96": ("HTRS96", "Croatian_Terrestrial_Reference_System",
               "GRS 1980", P.GRS80, 7019, 4761, _ZERO7),
    "IRENET95": ("IRENET95", "IRENET95", "GRS 1980", P.GRS80, 7019, 4173,
                 _ZERO7),
    "JGD2000": ("JGD2000", "Japanese_Geodetic_Datum_2000",
                "GRS 1980", P.GRS80, 7019, 4612, _ZERO7),
    "CGCS2000": ("China Geodetic Coordinate System 2000",
                 "China_2000", "CGCS2000", P.GRS80, 1024, 4490, None),
    "KGD2002": ("Korea 2000", "Geocentric_datum_of_Korea",
                "GRS 1980", P.GRS80, 7019, 4737, _ZERO7),
    "SVY21": ("SVY21", "SVY21", "WGS 84", P.WGS84, 7030, 4757, None),
    "OSGB36": ("OSGB36", "Ordnance_Survey_of_Great_Britain_1936",
               "Airy 1830", P.AIRY1830, 7001, 4277, P._DATUM_OSGB36),
    "CH1903+": ("CH1903+", "CH1903+", "Bessel 1841", P.BESSEL1841, 7004,
                4150, P._DATUM_CH1903P),
    "CH1903": ("CH1903", "CH1903", "Bessel 1841", P.BESSEL1841, 7004,
               4149, P._DATUM_CH1903P),
    "BD72": ("BD72", "Reseau_National_Belge_1972", "International 1924",
             P.INTL1924, 7022, 4313, P._DATUM_BD72),
    "S-JTSK": ("S-JTSK", "System_of_the_Unified_Trigonometrical_Cadastral"
               "_Network", "Bessel 1841", P.BESSEL1841, 7004, 4156,
               P._DATUM_SJTSK),
    # --- round-7 additions ---
    "JGD2011": ("JGD2011", "Japanese_Geodetic_Datum_2011",
                "GRS 1980", P.GRS80, 7019, 6668, _ZERO7),
    "SIRGAS2000": ("SIRGAS 2000",
                   "Sistema_de_Referencia_Geocentrico_para_las_AmericaS"
                   "_2000", "GRS 1980", P.GRS80, 7019, 4674, _ZERO7),
    "NAD83_2011": ("NAD83(2011)", "NAD83_National_Spatial_Reference"
                   "_System_2011", "GRS 1980", P.GRS80, 7019, 6318, _ZERO7),
    "NAD83_CSRS": ("NAD83(CSRS)", "NAD83_Canadian_Spatial_Reference"
                   "_System", "GRS 1980", P.GRS80, 7019, 4617, _ZERO7),
    "SPHERE_US": ("Unspecified datum based upon the Clarke 1866 Authalic "
                  "Sphere", "Not_specified_based_on_Clarke_1866_Authalic"
                  "_Sphere", "Clarke 1866 Authalic Sphere",
                  (6370997.0, 0.0), 7052, 4052, None),
    # --- round-8 additions ---
    "GDA2020": ("GDA2020", "Geocentric_Datum_of_Australia_2020",
                "GRS 1980", P.GRS80, 7019, 7844, _ZERO7),
    # --- round-9 additions ---
    "LKS92": ("LKS92", "Latvia_1992", "GRS 1980", P.GRS80, 7019, 4661,
              _ZERO7),
    "EST97": ("EST97", "Estonia_1997", "GRS 1980", P.GRS80, 7019, 4180,
              _ZERO7),
    "POSGAR07": ("POSGAR 2007",
                 "Posiciones_Geodesicas_Argentinas_2007",
                 "GRS 1980", P.GRS80, 7019, 5340, _ZERO7),
    "MAGNA": ("MAGNA-SIRGAS",
              "Marco_Geocentrico_Nacional_de_Referencia",
              "GRS 1980", P.GRS80, 7019, 4686, _ZERO7),
    "ISR93": ("Israel 1993", "Israel_1993", "GRS 1980", P.GRS80, 7019,
              4141, P._DATUM_ISR93),
    # --- round-10 additions ---
    "AMERSFOORT": ("Amersfoort", "Amersfoort", "Bessel 1841",
                   P.BESSEL1841, 7004, 4289, P._DATUM_AMERSFOORT),
    "HD72": ("HD72", "Hungarian_Datum_1972", "GRS 1967",
             P.GRS67, 7036, 4237, P._DATUM_HD72),
}

# projected CRS names + geographic base for every EPSG_TABLE code
# (names as in the EPSG registry; base frame from the table comments)
_PROJCS_INFO: dict[int, tuple[str, str]] = {
    4647: ("ETRS89 / UTM zone 32N (zE-N)", "ETRS89"),
    3794: ("D96/TM", "D96"),
    2180: ("ETRS89 / Poland CS92", "ETRS89"),
    3006: ("SWEREF99 TM", "SWEREF99"),
    3067: ("ETRS89 / TM35FIN(E,N)", "ETRS89"),
    3346: ("LKS94 / Lithuania TM", "LKS94"),
    3765: ("HTRS96 / Croatia TM", "HTRS96"),
    2157: ("IRENET95 / Irish Transverse Mercator", "IRENET95"),
    2193: ("NZGD2000 / New Zealand Transverse Mercator 2000", "NZGD2000"),
    3826: ("TWD97 / TM2 zone 121", "TWD97"),
    2154: ("RGF93 v1 / Lambert-93", "RGF93"),
    3082: ("NAD83 / Texas Centric Lambert Conformal", "NAD83"),
    32139: ("NAD83 / Texas Central", "NAD83"),
    3978: ("NAD83 / Canada Atlas Lambert", "NAD83"),
    3112: ("GDA94 / Geoscience Australia Lambert", "GDA94"),
    3416: ("ETRS89 / Austria Lambert", "ETRS89"),
    26985: ("NAD83 / Maryland", "NAD83"),
    32118: ("NAD83 / New York Long Island", "NAD83"),
    26986: ("NAD83 / Massachusetts Mainland", "NAD83"),
    2991: ("NAD83 / Oregon LCC (m)", "NAD83"),
    5070: ("NAD83 / Conus Albers", "NAD83"),
    3310: ("NAD83 / California Albers", "NAD83"),
    3086: ("NAD83 / Florida GDL Albers", "NAD83"),
    3577: ("GDA94 / Australian Albers", "GDA94"),
    3035: ("ETRS89-extended / LAEA Europe", "ETRS89"),
    3413: ("WGS 84 / NSIDC Sea Ice Polar Stereographic North", "WGS84"),
    3031: ("WGS 84 / Antarctic Polar Stereographic", "WGS84"),
    2451: ("JGD2000 / Japan Plane Rectangular CS IX", "JGD2000"),
    4547: ("CGCS2000 / 3-degree Gauss-Kruger CM 114E", "CGCS2000"),
    5186: ("Korea 2000 / Central Belt 2010", "KGD2002"),
    3763: ("ETRS89 / Portugal TM06", "ETRS89"),
    3414: ("SVY21 / Singapore TM", "SVY21"),
    6933: ("WGS 84 / NSIDC EASE-Grid 2.0 Global", "WGS84"),
    # --- round-7 additions ---
    3034: ("ETRS89-extended / LCC Europe", "ETRS89"),
    3111: ("GDA94 / Vicgrid", "GDA94"),
    3979: ("NAD83(CSRS) / Canada Atlas Lambert", "NAD83_CSRS"),
    6350: ("NAD83(2011) / Conus Albers", "NAD83_2011"),
    2163: ("US National Atlas Equal Area", "SPHERE_US"),
    3995: ("WGS 84 / Arctic Polar Stereographic", "WGS84"),
    3976: ("WGS 84 / NSIDC Sea Ice Polar Stereographic South", "WGS84"),
}

_ROMAN = ["I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X",
          "XI", "XII", "XIII", "XIV", "XV", "XVI", "XVII", "XVIII", "XIX"]

# names for the generated series rows (same arithmetic as the
# projections._generated_epsg_rows zones)
for _i in range(21):
    _PROJCS_INFO.setdefault(
        4534 + _i,
        (f"CGCS2000 / 3-degree Gauss-Kruger CM {75 + 3 * _i}E", "CGCS2000"))
    _PROJCS_INFO.setdefault(
        4513 + _i,
        (f"CGCS2000 / 3-degree Gauss-Kruger zone {25 + _i}", "CGCS2000"))
for _i in range(11):
    _PROJCS_INFO.setdefault(
        4491 + _i, (f"CGCS2000 / Gauss-Kruger zone {13 + _i}", "CGCS2000"))
    _PROJCS_INFO.setdefault(
        4502 + _i,
        (f"CGCS2000 / Gauss-Kruger CM {75 + 6 * _i}E", "CGCS2000"))
for _i in range(19):
    _PROJCS_INFO.setdefault(
        2443 + _i,
        (f"JGD2000 / Japan Plane Rectangular CS {_ROMAN[_i]}", "JGD2000"))
    _PROJCS_INFO.setdefault(
        6669 + _i,
        (f"JGD2011 / Japan Plane Rectangular CS {_ROMAN[_i]}", "JGD2011"))
for _i, _belt in enumerate(["West", "Central", "East", "East Sea"]):
    _PROJCS_INFO.setdefault(
        5185 + _i, (f"Korea 2000 / {_belt} Belt 2010", "KGD2002"))
for _i in range(9):
    _PROJCS_INFO.setdefault(
        3942 + _i, (f"RGF93 v1 / CC{42 + _i}", "RGF93"))
# round-8 series (same arithmetic as projections._generated_epsg_rows)
for _i in range(4):
    _PROJCS_INFO.setdefault(
        2176 + _i, (f"ETRS89 / Poland CS2000 zone {5 + _i}", "ETRS89"))
for _z in range(5, 31):
    _PROJCS_INFO.setdefault(5100 + _z, (f"ETRS89 / NTM zone {_z}", "ETRS89"))
_SPCS83_NAMES = {
    26941: "California zone 1", 26942: "California zone 2",
    26943: "California zone 3", 26944: "California zone 4",
    26945: "California zone 5", 26946: "California zone 6",
    26948: "Arizona East", 26949: "Arizona Central", 26950: "Arizona West",
    26958: "Florida East", 26959: "Florida West", 26960: "Florida North",
    26971: "Illinois East", 26972: "Illinois West",
    32115: "New York East", 32116: "New York Central",
    32117: "New York West", 32119: "North Carolina",
    32128: "Pennsylvania North", 32129: "Pennsylvania South",
    32137: "Texas North", 32140: "Texas South Central", 32141: "Texas South",
    32148: "Washington North", 32149: "Washington South",
    # r12 meter twins of the new ftUS/ift foot grids
    26953: "Colorado North", 26954: "Colorado Central",
    26955: "Colorado South",
    26966: "Georgia East", 26967: "Georgia West",
    26981: "Louisiana North", 26982: "Louisiana South",
    26983: "Maine East", 26984: "Maine West",
    26988: "Michigan North", 26989: "Michigan Central",
    26990: "Michigan South",
    # r12b tranche: the remaining states
    26929: "Alabama East", 26930: "Alabama West",
    26940: "Alaska zone 10",
    26951: "Arkansas North", 26952: "Arkansas South",
    26956: "Connecticut", 26957: "Delaware",
    26968: "Idaho East", 26969: "Idaho Central", 26970: "Idaho West",
    26973: "Indiana East", 26974: "Indiana West",
    26975: "Iowa North", 26976: "Iowa South",
    26977: "Kansas North", 26978: "Kansas South",
    26979: "Kentucky North", 26980: "Kentucky South",
    3088: "Kentucky Single Zone",
    26991: "Minnesota North", 26992: "Minnesota Central",
    26993: "Minnesota South",
    26994: "Mississippi East", 26995: "Mississippi West",
    26996: "Missouri East", 26997: "Missouri Central",
    26998: "Missouri West",
    32100: "Montana", 32104: "Nebraska",
    32107: "Nevada East", 32108: "Nevada Central", 32109: "Nevada West",
    32110: "New Hampshire", 32111: "New Jersey",
    32112: "New Mexico East", 32113: "New Mexico Central",
    32114: "New Mexico West",
    32120: "North Dakota North", 32121: "North Dakota South",
    32122: "Ohio North", 32123: "Ohio South",
    32124: "Oklahoma North", 32125: "Oklahoma South",
    32126: "Oregon North", 32127: "Oregon South",
    32130: "Rhode Island", 32133: "South Carolina",
    32134: "South Dakota North", 32135: "South Dakota South",
    32136: "Tennessee", 32138: "Texas North Central",
    32142: "Utah North", 32143: "Utah Central", 32144: "Utah South",
    32145: "Vermont",
    32146: "Virginia North", 32147: "Virginia South",
    32150: "West Virginia North", 32151: "West Virginia South",
    32152: "Wisconsin North", 32153: "Wisconsin Central",
    32154: "Wisconsin South",
    32155: "Wyoming East", 32156: "Wyoming East Central",
    32157: "Wyoming West Central", 32158: "Wyoming West",
}
for _z in range(2, 10):
    _SPCS83_NAMES[26930 + _z] = f"Alaska zone {_z}"
for _z in range(1, 6):
    _SPCS83_NAMES[26960 + _z] = f"Hawaii zone {_z}"
for _c, _zn in _SPCS83_NAMES.items():
    _PROJCS_INFO.setdefault(_c, (f"NAD83 / {_zn}", "NAD83"))
# round-9 pinned rows + round-9b series (same arithmetic as
# projections._generated_epsg_rows; SIRGAS UTM rides the generic UTM
# recipe in wkt_for_epsg, so only the non-UTM rows need names)
_PROJCS_INFO.update({
    3059: ("LKS-92 / Latvia TM", "LKS92"),
    3301: ("Estonian Coordinate System of 1997", "EST97"),
    3812: ("ETRS89 / Belgian Lambert 2008", "ETRS89"),
    3347: ("NAD83 / Statistics Canada Lambert", "NAD83"),
    7845: ("GDA2020 / GA LCC", "GDA2020"),
    9311: ("NAD27 / US National Atlas Equal Area", "SPHERE_US"),
    # r12 rows
    5179: ("Korea 2000 / Unified CS", "KGD2002"),
    5880: ("SIRGAS 2000 / Brazil Polyconic", "SIRGAS2000"),
    32661: ("WGS 84 / UPS North (N,E)", "WGS84"),
    32761: ("WGS 84 / UPS South (N,E)", "WGS84"),
    5041: ("WGS 84 / UPS North (E,N)", "WGS84"),
    5042: ("WGS 84 / UPS South (E,N)", "WGS84"),
})
for _i, _nm in enumerate(["12 00", "13 30", "15 00", "16 30", "18 00",
                          "14 15", "15 45", "17 15", "18 45", "20 15",
                          "21 45", "23 15"]):
    _PROJCS_INFO.setdefault(3007 + _i, (f"SWEREF99 {_nm}", "SWEREF99"))
for _i in range(4):
    _PROJCS_INFO.setdefault(4093 + _i, (f"ETRS89 / DKTM{_i + 1}", "ETRS89"))
for _i in range(7):
    _PROJCS_INFO.setdefault(
        5343 + _i, (f"POSGAR 2007 / Argentina {_i + 1}", "POSGAR07"))
for _c, _zn in zip(range(3114, 3119),
                   ["Colombia Far West zone", "Colombia West zone",
                    "Colombia Bogota zone", "Colombia East Central zone",
                    "Colombia East zone"]):
    _PROJCS_INFO.setdefault(_c, (f"MAGNA-SIRGAS / {_zn}", "MAGNA"))


def _num(v: float) -> str:
    """Trim-float formatting: integers bare, else up to 13 significant
    decimals with no trailing zeros (matches GDAL's WKT number style)."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(round(float(v), 13))


def _geogcs_wkt(key: str) -> str:
    name, datum, sph_name, (a, inv_f_inv), sph_code, gcs_code, tow = \
        _GEOGCS[key]
    # WKT convention: a sphere's inverse flattening is written as 0
    inv_f = 1.0 / inv_f_inv if inv_f_inv else 0.0
    parts = [f'SPHEROID["{sph_name}",{_num(a)},{_num(round(inv_f, 9))},'
             f'AUTHORITY["EPSG","{sph_code}"]]']
    if tow is not None:
        parts.append("TOWGS84[" + ",".join(_num(t) for t in tow) + "]")
    datum_body = ",".join(parts)
    return (f'GEOGCS["{name}",DATUM["{datum}",{datum_body}],'
            f'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
            f'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
            f'AUTHORITY["EPSG","{gcs_code}"]]')


def _projcs(name: str, geogcs_key: str, projection: str,
            params: list[tuple[str, float]], code: int) -> str:
    body = ",".join(f'PARAMETER["{k}",{_num(v)}]' for k, v in params)
    return (f'PROJCS["{name}",{_geogcs_wkt(geogcs_key)},'
            f'PROJECTION["{projection}"],{body},'
            f'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
            f'AUTHORITY["EPSG","{code}"]]')


_FAMILY_WKT = {
    "tm": ("Transverse_Mercator",
           [("lat0", "latitude_of_origin"), ("lon0", "central_meridian"),
            ("k0", "scale_factor"), ("fe", "false_easting"),
            ("fn", "false_northing")]),
    "lcc": ("Lambert_Conformal_Conic_2SP",
            [("lat1", "standard_parallel_1"), ("lat2", "standard_parallel_2"),
             ("lat0", "latitude_of_origin"), ("lon0", "central_meridian"),
             ("fe", "false_easting"), ("fn", "false_northing")]),
    "albers": ("Albers_Conic_Equal_Area",
               [("lat1", "standard_parallel_1"),
                ("lat2", "standard_parallel_2"),
                ("lat0", "latitude_of_center"),
                ("lon0", "longitude_of_center"),
                ("fe", "false_easting"), ("fn", "false_northing")]),
    "laea": ("Lambert_Azimuthal_Equal_Area",
             [("lat0", "latitude_of_center"), ("lon0", "longitude_of_center"),
              ("fe", "false_easting"), ("fn", "false_northing")]),
    "ps": ("Polar_Stereographic",
           [("lat_ts", "latitude_of_origin"), ("lon0", "central_meridian"),
            ("fe", "false_easting"), ("fn", "false_northing")]),
    "cea": ("Cylindrical_Equal_Area",
            [("lat_ts", "standard_parallel_1"), ("lon0", "central_meridian"),
             ("fe", "false_easting"), ("fn", "false_northing")]),
    "poly": ("Polyconic",
             [("lat0", "latitude_of_origin"), ("lon0", "central_meridian"),
              ("fe", "false_easting"), ("fn", "false_northing")]),
}


def wkt_for_epsg(code: int) -> str | None:
    """Complete WKT1 for a supported EPSG code, else None.

    Covers: 4326, 3857, the WGS84/ETRS89/NAD83/GDA94 UTM ranges, every
    EPSG_TABLE projection, and the Helmert-datum specials (27700, 2056,
    21781, 31370, 5514).  The returned string always ends with the
    CRS's own ``AUTHORITY["EPSG","<code>"]`` clause, which is what
    shapefile.read_prj_epsg keys on.
    """
    if code == 4326:
        return _geogcs_wkt("WGS84")
    if code == 3857:
        return _projcs(
            "WGS 84 / Pseudo-Mercator", "WGS84", "Mercator_1SP",
            [("central_meridian", 0.0), ("scale_factor", 1.0),
             ("false_easting", 0.0), ("false_northing", 0.0)], 3857)

    # UTM families share one parameter recipe
    utm = None
    if 32601 <= code <= 32660:
        utm = ("WGS 84", "WGS84", code - 32600, 0.0)
    elif 32701 <= code <= 32760:
        utm = ("WGS 84", "WGS84", code - 32700, 10000000.0)
    elif 25828 <= code <= 25838:
        utm = ("ETRS89", "ETRS89", code - 25800, 0.0)
    elif 26901 <= code <= 26923:
        utm = ("NAD83", "NAD83", code - 26900, 0.0)
    elif 31965 <= code <= 31976:
        utm = ("SIRGAS 2000", "SIRGAS2000", code - 31954, 0.0)
    elif 31977 <= code <= 31985:
        utm = ("SIRGAS 2000", "SIRGAS2000", code - 31960, 10000000.0)
    elif 28348 <= code <= 28358 or 7846 <= code <= 7858:
        if code >= 28348:
            frame, zone = "GDA94", code - 28300
        else:
            frame, zone = "GDA2020", code - 7800
        return _projcs(f"{frame} / MGA zone {zone}", frame,
                       "Transverse_Mercator",
                       [("latitude_of_origin", 0.0),
                        ("central_meridian", 6.0 * zone - 183.0),
                        ("scale_factor", 0.9996),
                        ("false_easting", 500000.0),
                        ("false_northing", 10000000.0)], code)
    if utm is not None:
        frame, key, zone, fn = utm
        hemi = "S" if fn else "N"
        return _projcs(f"{frame} / UTM zone {zone}{hemi}", key,
                       "Transverse_Mercator",
                       [("latitude_of_origin", 0.0),
                        ("central_meridian", 6.0 * zone - 183.0),
                        ("scale_factor", 0.9996),
                        ("false_easting", 500000.0),
                        ("false_northing", fn)], code)

    ent = P.EPSG_TABLE.get(code)
    if ent is not None and code in _PROJCS_INFO:
        fam, _ell, params = ent
        proj_name, param_map = _FAMILY_WKT[fam]
        name, geog_key = _PROJCS_INFO[code]
        plist = [(wkt_key, params[pkey]) for pkey, wkt_key in param_map]
        if fam == "ps":
            # variant B carries a unity scale factor in WKT1; the
            # pole-tangent variant A (UPS) carries its k0 — writing 1.0
            # there would disagree with the executed kernel by 0.6%
            plist.insert(2, ("scale_factor", params.get("k0", 1.0)))
        return _projcs(name, geog_key, proj_name, plist, code)

    if code == 2039:
        # same constants as the procedural registry row (projections
        # _proj_for_epsg code 2039); the ISR93 datum entry carries the
        # EPSG:1073 translation in TOWGS84
        return _projcs("Israel 1993 / Israeli TM Grid", "ISR93",
                       "Transverse_Mercator",
                       [("latitude_of_origin",
                         31.0 + 44.0 / 60.0 + 3.817 / 3600.0),
                        ("central_meridian",
                         35.0 + 12.0 / 60.0 + 16.261 / 3600.0),
                        ("scale_factor", 1.0000067),
                        ("false_easting", 219529.584),
                        ("false_northing", 626907.39)], 2039)
    if code == 27700:
        return _projcs("OSGB36 / British National Grid", "OSGB36",
                       "Transverse_Mercator",
                       [("latitude_of_origin", 49.0),
                        ("central_meridian", -2.0),
                        ("scale_factor", 0.9996012717),
                        ("false_easting", 400000.0),
                        ("false_northing", -100000.0)], 27700)
    if code in (2056, 21781):
        e0, n0 = (2600000.0, 1200000.0) if code == 2056 else \
            (600000.0, 200000.0)
        name = "CH1903+ / LV95" if code == 2056 else "CH1903 / LV03"
        return _projcs(name, "CH1903+" if code == 2056 else "CH1903",
                       "Hotine_Oblique_Mercator_Azimuth_Center",
                       [("latitude_of_center", 46.0 + 57.0 / 60.0
                         + 8.66 / 3600.0),
                        ("longitude_of_center", 7.0 + 26.0 / 60.0
                         + 22.50 / 3600.0),
                        ("azimuth", 90.0), ("rectified_grid_angle", 90.0),
                        ("scale_factor", 1.0),
                        ("false_easting", e0), ("false_northing", n0)], code)
    if code == 31370:
        return _projcs("BD72 / Belgian Lambert 72", "BD72",
                       "Lambert_Conformal_Conic_2SP",
                       [("standard_parallel_1", 51.0 + 10.0 / 60.0
                         + 0.00204 / 3600.0),
                        ("standard_parallel_2", 49.0 + 50.0 / 60.0
                         + 0.00204 / 3600.0),
                        ("latitude_of_origin", 90.0),
                        ("central_meridian", 4.0 + 22.0 / 60.0
                         + 2.952 / 3600.0),
                        ("false_easting", 150000.013),
                        ("false_northing", 5400088.438)], 31370)
    if code == 28992:
        return _projcs("Amersfoort / RD New", "AMERSFOORT",
                       "Oblique_Stereographic",
                       [("latitude_of_origin",
                         52.0 + 9.0 / 60.0 + 22.178 / 3600.0),
                        ("central_meridian",
                         5.0 + 23.0 / 60.0 + 15.5 / 3600.0),
                        ("scale_factor", 0.9999079),
                        ("false_easting", 155000.0),
                        ("false_northing", 463000.0)], 28992)
    if code == 23700:
        return _projcs("HD72 / EOV", "HD72",
                       "Hotine_Oblique_Mercator_Azimuth_Center",
                       [("latitude_of_center",
                         47.0 + 8.0 / 60.0 + 39.8174 / 3600.0),
                        ("longitude_of_center",
                         19.0 + 2.0 / 60.0 + 54.8584 / 3600.0),
                        ("azimuth", 90.0), ("rectified_grid_angle", 90.0),
                        ("scale_factor", 0.99993),
                        ("false_easting", 650000.0),
                        ("false_northing", 200000.0)], 23700)
    if code == 5514:
        return _projcs("S-JTSK / Krovak East North", "S-JTSK", "Krovak",
                       [("latitude_of_center", 49.5),
                        ("longitude_of_center", 24.0 + 50.0 / 60.0),
                        ("azimuth", 30.0 + 17.0 / 60.0 + 17.3031 / 3600.0),
                        ("pseudo_standard_parallel_1", 78.5),
                        ("scale_factor", 0.9999),
                        ("false_easting", 0.0), ("false_northing", 0.0)],
                       5514)
    return None
