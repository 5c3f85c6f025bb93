"""Blob store (DFG FolderStore/addData! analogue, testScalarFields.jl:68-70)
and plotting analogues (RoMEPlotting drawPoses/plotSLAM2D/drawTree,
MITDatasetBatch.jl:46-50).
"""

import os

import numpy as np
import pytest

from rome_tpu import FactorGraph, MvNormal, Pose2, Pose2Pose2, PriorPose2
from rome_tpu.io.blobstore import (
    FolderStore,
    InMemoryStore,
    add_blob_store,
    add_data,
    delete_data,
    get_data,
    list_data_entries,
)
from rome_tpu.io.serialization import load_dfg, save_dfg


def _small_graph():
    fg = FactorGraph()
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])))
    for i in range(1, 6):
        fg.add_variable(f"x{i}", Pose2)
        fg.add_factor(
            [f"x{i-1}", f"x{i}"],
            Pose2Pose2(MvNormal([1, 0, 0.2], [0.1, 0.1, 0.05])),
        )
    fg.init_all()
    return fg


@pytest.mark.parametrize("store_cls", [FolderStore, InMemoryStore])
def test_blob_store_roundtrip(tmp_path, store_cls):
    fg = _small_graph()
    if store_cls is FolderStore:
        store = FolderStore("default_folder_store", str(tmp_path / "data"))
    else:
        store = InMemoryStore()
    add_blob_store(fg, store)
    payload = np.random.default_rng(0).bytes(4096)
    entry = add_data(fg, "x1", "dem_tile", payload, mime="image/tiff")
    assert entry.size == 4096
    assert list_data_entries(fg, "x1") == ["dem_tile"]
    e2, data = get_data(fg, "x1", "dem_tile")
    assert data == payload
    assert e2.sha256 == entry.sha256
    delete_data(fg, "x1", "dem_tile")
    assert list_data_entries(fg, "x1") == []
    assert not store.has(entry.blob_id)


def test_blob_entries_survive_save_load(tmp_path):
    """Graph checkpoints carry blob REFERENCES, not payloads — reloading
    against the same store resolves the original bytes."""
    fg = _small_graph()
    store = add_blob_store(
        fg, FolderStore("default_folder_store", str(tmp_path / "data"))
    )
    payload = b"\x00\x01" * 1000
    entry = add_data(fg, "x2", "scan", payload)
    path = save_dfg(fg, str(tmp_path / "g.tar.gz"))
    # the checkpoint must NOT inline the payload
    assert os.path.getsize(path) < 20_000 + entry.size  # tiny graph + ref
    fg2 = load_dfg(path)
    add_blob_store(fg2, store)
    e2, data = get_data(fg2, "x2", "scan")
    assert data == payload
    assert e2.blob_id == entry.blob_id


def test_plotting_analogues(tmp_path):
    plt_mod = pytest.importorskip("matplotlib")
    from rome_tpu.services.plotting import (
        draw_poses, draw_tree, plot_kde, plot_slam2d,
    )

    fg = _small_graph()
    from rome_tpu import solve_graph_parametric

    solve_graph_parametric(fg, init=False)
    fig = plot_slam2d(fg, path=str(tmp_path / "slam2d.png"))
    assert os.path.exists(tmp_path / "slam2d.png")
    assert fig.axes
    fig2 = draw_poses(fg)
    assert fig2.axes

    pts = np.random.default_rng(1).normal(size=(300, 3))
    fig3 = plot_kde(pts, dims=(0, 1), path=str(tmp_path / "kde.png"))
    assert os.path.exists(tmp_path / "kde.png")

    from rome_tpu.solvers.multimodal.tree import (
        build_tree_from_ordering, get_elimination_order,
    )

    tree = build_tree_from_ordering(fg, get_elimination_order(fg))
    fig4 = draw_tree(tree, path=str(tmp_path / "tree.png"))
    assert os.path.exists(tmp_path / "tree.png")
