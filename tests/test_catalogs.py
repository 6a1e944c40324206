"""Dataset catalog tests against fabricated on-disk layouts (the annotation
formats real deployments depend on; reference: datasets/classification/)."""
import json

import pytest

from rspnet_tpu.data.catalogs import (HMDB51, Kinetics, SmthSmth, UCF101,
                                      build_catalog)
from rspnet_tpu.config.tree import ConfigTree


@pytest.fixture
def ucf_tree(tmp_path):
    videos = tmp_path / "videos"
    ann = tmp_path / "ann"
    ann.mkdir()
    for cls in ("ApplyEyeMakeup", "Archery"):
        (videos / cls).mkdir(parents=True)
        for i in range(2):
            (videos / cls / f"v_{cls}_g0{i}_c01.avi").write_bytes(b"x")
    (ann / "classInd.txt").write_text(
        "1 ApplyEyeMakeup\n2 Archery\n")
    (ann / "trainlist01.txt").write_text(
        "ApplyEyeMakeup/v_ApplyEyeMakeup_g00_c01.avi 1\n"
        "Archery/v_Archery_g00_c01.avi 2\n")
    (ann / "testlist01.txt").write_text(
        "ApplyEyeMakeup/v_ApplyEyeMakeup_g01_c01.avi\n")  # no class index!
    return videos, ann


def test_ucf101_train_and_test(ucf_tree):
    videos, ann = ucf_tree
    train = UCF101(videos, ann, fold=1, split="train")
    assert len(train) == 2
    assert train[0].class_index == 0
    assert train[1].class_index == 1
    # test list has no class column: class comes from the path
    test = UCF101(videos, ann, fold=1, split="test")
    assert len(test) == 1
    assert test[0].class_index == 0
    assert test[0].video_path.endswith("g01_c01.avi")


def test_ucf101_extension_fallback(ucf_tree):
    videos, ann = ucf_tree
    # list says .avi but only .mp4 exists
    mp4 = videos / "Archery" / "v_Archery_g05_c01.mp4"
    mp4.write_bytes(b"x")
    (ann / "trainlist01.txt").write_text("Archery/v_Archery_g05_c01.avi 2\n")
    train = UCF101(videos, ann, fold=1, split="train")
    assert train[0].video_path.endswith(".mp4")


def test_hmdb51_split_tags(tmp_path):
    videos = tmp_path / "videos"
    ann = tmp_path / "ann"
    ann.mkdir()
    for cls in ("brush_hair", "cartwheel"):
        (videos / cls).mkdir(parents=True)
        for i in range(3):
            (videos / cls / f"{cls}_{i}.avi").write_bytes(b"x")
    # tag 1 = train, 2 = test, 0 = unused (reference: hmdb51.py tags)
    (ann / "brush_hair_test_split1.txt").write_text(
        "brush_hair_0.avi 1\nbrush_hair_1.avi 2\nbrush_hair_2.avi 0\n")
    (ann / "cartwheel_test_split1.txt").write_text(
        "cartwheel_0.avi 2\ncartwheel_1.avi 1\ncartwheel_2.avi 1\n")

    train = HMDB51(str(videos), str(ann), fold=1, split="train")
    names = sorted(s.video_path.split("/")[-1] for s in train.samples)
    assert names == ["brush_hair_0.avi", "cartwheel_1.avi", "cartwheel_2.avi"]
    test = HMDB51(str(videos), str(ann), fold=1, split="test")
    names = sorted(s.video_path.split("/")[-1] for s in test.samples)
    assert names == ["brush_hair_1.avi", "cartwheel_0.avi"]
    assert {s.class_index for s in train.samples} == {0, 1}


def test_kinetics_blacklist(tmp_path):
    root = tmp_path / "k"
    for cls in ("abseiling", "zumba"):
        (root / "train_video" / cls).mkdir(parents=True)
        (root / "train_video" / cls / "a.mp4").write_bytes(b"x")
        (root / "train_video" / cls / "b.mp4").write_bytes(b"x")
    cat = Kinetics(str(root), split="train",
                   blacklist=["train_video/zumba/a.mp4"])
    assert len(cat) == 3
    assert cat.class_to_index == {"abseiling": 0, "zumba": 1}
    paths = [s.video_path for s in cat.samples]
    assert not any(p.endswith("zumba/a.mp4") for p in paths)


def test_kinetics_empty_raises(tmp_path):
    root = tmp_path / "k"
    (root / "train_video").mkdir(parents=True)
    with pytest.raises(FileNotFoundError):
        Kinetics(str(root), split="val", blacklist=[])


def test_smth_smth_json(tmp_path):
    videos = tmp_path / "v"
    ann = tmp_path / "a"
    videos.mkdir()
    ann.mkdir()
    (ann / "something-something-v2-labels.json").write_text(json.dumps(
        {"Doing something": "0", "Doing other thing": "1"}))
    (ann / "something-something-v2-train.json").write_text(json.dumps([
        {"id": "123", "template": "Doing [something]"},
        {"id": "456", "template": "Doing other thing"},
    ]))
    (ann / "something-something-v2-validation.json").write_text(json.dumps([
        {"id": "789", "template": "Doing something"},
    ]))
    train = SmthSmth(str(videos), str(ann), split="train")
    assert len(train) == 2
    assert train[0].video_path.endswith("123.mp4")
    assert train[0].class_index == 0  # [brackets] stripped from template
    assert train[1].class_index == 1
    val = SmthSmth(str(videos), str(ann), split="val")
    assert len(val) == 1


def test_build_catalog_dispatch(tmp_path, ucf_tree):
    videos, ann = ucf_tree
    cfg = ConfigTree.from_dict({"dataset": {
        "name": "ucf101", "root": str(videos),
        "annotation_path": str(ann), "fold": 1}})
    cat = build_catalog(cfg, "train")
    assert len(cat) == 2
    with pytest.raises(ValueError, match="Unknown dataset"):
        build_catalog(ConfigTree.from_dict(
            {"dataset": {"name": "bogus"}}), "train")
