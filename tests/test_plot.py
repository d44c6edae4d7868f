"""Engine.plot_conv — the `yatsm pixel --plot` SVG surface (plot.py)."""

import xml.etree.ElementTree as ET

import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from yatsm_spark.api import Engine
    from yatsm_spark.synth import generate_transcripts

    return Engine(spark, generate_transcripts(spark, 8, max_turns=1_200))


def test_plot_conv_svg_structure(engine):
    svg = engine.plot_conv("conv00000005")
    root = ET.fromstring(svg)  # well-formed XML
    assert root.tag.endswith("svg")

    ns = "{http://www.w3.org/2000/svg}"
    polys = root.findall(f"{ns}polyline")
    fits = [p for p in polys if p.get("class") == "fit"]
    breaks = [ln for ln in root.findall(f"{ns}line") if ln.get("class") == "break"]

    parts = engine.explain_conv("conv00000005")
    segs = parts["segments"].toPandas()
    assert len(fits) == len(segs)
    assert len(breaks) == int(segs["break_ts"].notna().sum())
    # observed series polyline present
    assert any(p.get("class") == "obs" for p in polys)


def test_plot_conv_writes_file(engine, tmp_path):
    out = tmp_path / "conv.svg"
    svg = engine.plot_conv("conv00000002", path=str(out))
    assert out.read_text() == svg and svg.startswith("<svg")
