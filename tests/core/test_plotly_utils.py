

def test_to_plotly_upgrade_path(monkeypatch):
    """`.to_plotly()` (the upgrade to a real plotly Figure,
    /root/reference/pylinac/core/plotly_utils.py:1) has no installable
    plotly here; a stub with the real constructor contract validates the
    call path: data must be a list of dicts with a 'type' key and layout a
    plain dict — the exact inputs go.Figure accepts."""
    import sys
    import types

    import numpy as np

    from pylinac_tpu.core.plotly_utils import Figure, heatmap_trace, scatter_trace

    captured = {}

    class _GoFigure:
        def __init__(self, data=None, layout=None):
            assert isinstance(data, list)
            for tr in data:
                assert isinstance(tr, dict) and "type" in tr
                for v in tr.values():  # JSON-serializable leaves only
                    assert not isinstance(v, np.ndarray) or v.ndim <= 2
            assert isinstance(layout, dict)
            captured["data"] = data
            captured["layout"] = layout

    go = types.ModuleType("plotly.graph_objects")
    go.Figure = _GoFigure
    plotly = types.ModuleType("plotly")
    plotly.graph_objects = go
    monkeypatch.setitem(sys.modules, "plotly", plotly)
    monkeypatch.setitem(sys.modules, "plotly.graph_objects", go)

    fig = Figure(layout={"title": {"text": "t"}})
    fig.add_trace(heatmap_trace(np.zeros((4, 5))))
    fig.add_trace(scatter_trace([1, 2], [3, 4], name="s"))
    out = fig.to_plotly()
    assert isinstance(out, _GoFigure)
    assert len(captured["data"]) == 2
    assert captured["data"][0]["type"] == "heatmap"
    assert captured["layout"].get("title") is not None
