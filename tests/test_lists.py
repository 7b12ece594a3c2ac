"""Filesystem-contract tests: txt lists, path rewriting, K-list generation."""
import os

import numpy as np
import pytest

from ccst_tpu.data.lists import (
    generate_k_lists,
    parse_list,
    stylized_output_path,
    train_list_path,
    unified_original_path,
    unified_tree_path,
    write_list,
)


def test_list_roundtrip(tmp_path):
    path = tmp_path / "a_train.txt"
    names = ["DATA/kfold/d/c/img0.png", "DATA/kfold/d/c/img1.jpg"]
    labels = [0, 3]
    write_list(path, names, labels)
    rn, rl = parse_list(path)
    assert rn == names and rl == labels


def test_write_list_truncates(tmp_path):
    """Rerunning generation must not duplicate lines (reference bug
    data_list_generator.py:57 used append mode)."""
    path = tmp_path / "l.txt"
    write_list(path, ["a"], [1])
    write_list(path, ["a"], [1])
    assert len(parse_list(path)[0]) == 1


def test_stylized_output_path():
    p = "PACS/kfold/photo/dog/pic_001.jpg"
    out = stylized_output_path(p, "photo", "sketch", "overall")
    assert out == "PACS/all_style_transferred_Overall/photo/sketch/dog/pic_001_sketch.jpg"
    out = stylized_output_path(p, "photo", "cartoon", "single")
    assert out == "PACS/all_style_transferred_Single/photo/cartoon/dog/pic_001_cartoon.jpg"


def test_unified_tree_paths():
    p = "PACS/kfold/cartoon/horse/x.png"
    orig = unified_original_path(p, "photo", "adain", "overall")
    assert orig == "PACS/kfold_adain-overall-multi/photo/cartoon/horse/x.png"
    styl = unified_tree_path(p, "photo", "sketch", "adain", "overall")
    assert styl == "PACS/kfold_adain-overall-multi/photo/cartoon/horse/x_sketch.png"


def make_pacs_lists(root, n_per_domain=6):
    domains = ["art_painting", "cartoon", "photo", "sketch"]
    for d in domains:
        names = [f"PACS/kfold/{d}/dog/img{i}.png" for i in range(n_per_domain)]
        labels = [i % 7 for i in range(n_per_domain)]
        write_list(
            os.path.join(root, "txt_lists", "pacs", f"{d}_train.txt"), names, labels
        )
        write_list(
            os.path.join(root, "txt_lists", "pacs", f"{d}_test.txt"), names[:2], labels[:2]
        )
    return domains


def test_generate_k_lists(tmp_path):
    root = str(tmp_path)
    make_pacs_lists(root)
    written = generate_k_lists(root, "pacs", target="photo", k=2, seed=1)
    assert set(written) == {"art_painting", "cartoon", "sketch"}
    for client, path in written.items():
        names, labels = parse_list(path)
        # 6 images x K=2 rows
        assert len(names) == 12
        for n in names:
            assert "kfold_adain-overall-multi/photo/" in n
            assert "photo/photo" not in n  # target domain never a source
        # own-domain rows keep the original filename (no style suffix)
        own = [n for n in names if n.endswith(".png") and "_" not in os.path.basename(n).replace("img", "")]
        # every row must reference this client's own images
        assert all(f"/{client}/" in n for n in names)


def test_generate_k_lists_deterministic(tmp_path):
    root = str(tmp_path)
    make_pacs_lists(root)
    a = generate_k_lists(root, "pacs", target="photo", k=3, seed=7)
    first = parse_list(a["cartoon"])[0]
    b = generate_k_lists(root, "pacs", target="photo", k=3, seed=7)
    assert parse_list(b["cartoon"])[0] == first


def test_generate_k_lists_k_validation(tmp_path):
    root = str(tmp_path)
    make_pacs_lists(root)
    with pytest.raises(ValueError):
        generate_k_lists(root, "pacs", target="photo", k=4)  # only 3 sources
    with pytest.raises(ValueError):
        generate_k_lists(root, "pacs", target="nope", k=1)


def test_train_list_path_fusion_modes():
    assert train_list_path("/r", "pacs", "cartoon") == (
        "/r/txt_lists/pacs/cartoon_train.txt"
    )
    assert train_list_path(
        "/r", "pacs", "cartoon", fusion_dir="adain-overall-K3", target="photo"
    ) == "/r/txt_lists/pacs_adain-overall-K3/photo/cartoon_train.txt"


def test_parse_list_tolerates_spaces(tmp_path):
    """Filenames with spaces round-trip (the reference's split(' ') crashes
    on them; the byte format is unchanged — label is the LAST field)."""
    p = str(tmp_path / "l.txt")
    write_list(p, ["pacs/kfold/a/dog/old photo.png"], [3])
    names, labels = parse_list(p)
    assert names == ["pacs/kfold/a/dog/old photo.png"] and labels == [3]


def test_generate_k_lists_save_ext(tmp_path):
    """--save-ext threads into stylized list entries (the materialized tree
    carries the rewritten extension); originals keep theirs."""
    root = str(tmp_path)
    make_pacs_lists(root)
    written = generate_k_lists(
        root, "pacs", target="photo", k=2, seed=1, save_ext=".jpg"
    )
    names, _ = parse_list(written["cartoon"])
    stylized = [n for n in names if os.path.basename(n).split(".")[0].endswith(
        ("_art_painting", "_sketch"))]
    originals = [n for n in names if n not in stylized]
    assert stylized and all(n.endswith(".jpg") for n in stylized)
    assert originals and all(n.endswith(".png") for n in originals)


def test_filter_blank_fails_loudly_on_bad_root(tmp_path):
    from ccst_tpu.data.lists import filter_blank_images

    root = str(tmp_path)
    make_pacs_lists(root)
    with pytest.raises(IOError, match="kept 0 of"):
        filter_blank_images(root, "pacs", data_root="/nonexistent/root")


def test_split_image_tree_skips_non_images(tmp_path):
    from ccst_tpu.data.lists import split_image_tree
    from ccst_tpu.data.loader import save_image_u8

    root = str(tmp_path)
    for cls in ("dog", "horse"):
        d = os.path.join(root, "PACS/kfold/cartoon", cls)
        os.makedirs(d)
        for i in range(3):
            save_image_u8(
                np.full((8, 8, 3), 0.5, np.float32),
                os.path.join(d, f"img{i}.png"),
            )
        open(os.path.join(d, "Thumbs.db"), "w").write("junk")
    written = split_image_tree(
        root, "pacs", root, train_fraction=0.5, seed=1,
        tree_subdir="PACS/kfold",
    )
    tr, te = written["cartoon"]
    names = parse_list(tr)[0] + parse_list(te)[0]
    assert len(names) == 6
    assert not any("Thumbs" in n for n in names)
