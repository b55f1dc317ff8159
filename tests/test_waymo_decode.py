"""Devkit-free Waymo tfrecord decoder tests.

The reference decodes tfrecords with tensorflow + waymo_open_dataset
(pcdet/datasets/waymo/waymo_utils.py:169-260); none of that exists here,
so these tests validate lvv_tpu.data.{tfrecord_io,waymo_decode} against
hand-derived byte formats and geometry:

- crc32c / TFRecord framing against the published test vector and a
  write->read round trip;
- proto wire codec round trips (packed + unpacked branches);
- range-image unprojection against closed-form spherical geometry,
  extrinsics, and per-pixel rolling-shutter poses;
- label conversion (speed rotation into the vehicle frame);
- decode_sequence end-to-end on a fabricated 3-frame tfrecord, feeding
  the result straight into WaymoDetection (the online loader).
"""
import numpy as np
import pytest

from lvv_tpu.data import tfrecord_io as tio
from lvv_tpu.data import waymo_decode as wd


# ------------------------------------------------------------ tfrecord_io

def test_crc32c_vector():
    # RFC 3720 test vector for CRC32C (Castagnoli).
    assert tio.crc32c(b"123456789") == 0xE3069283
    assert tio.crc32c(b"") == 0


def test_tfrecord_roundtrip(tmp_path):
    recs = [b"hello", b"", b"\x00" * 1000, bytes(range(256))]
    path = tmp_path / "t.tfrecord"
    tio.write_tfrecord(path, recs)
    assert list(tio.read_tfrecord(path, verify_crc=True)) == recs


def test_tfrecord_crc_detects_corruption(tmp_path):
    path = tmp_path / "t.tfrecord"
    tio.write_tfrecord(path, [b"payload-bytes"])
    raw = bytearray(path.read_bytes())
    raw[14] ^= 0xFF                                   # flip a payload byte
    path.write_bytes(bytes(raw))
    with pytest.raises(IOError):
        list(tio.read_tfrecord(path, verify_crc=True))
    # and without verification it yields the (corrupt) payload
    assert len(list(tio.read_tfrecord(path))) == 1


def test_proto_scalar_roundtrip():
    buf = (tio.field_varint(1, 300) + tio.field_double(2, -2.5)
           + tio.field_float(3, 1.5) + tio.field_string(4, "seg-1")
           + tio.field_varint(5, 0))
    f = tio.parse_fields(buf)
    assert tio.get_varint(f, 1) == 300
    assert tio.get_double(f, 2) == -2.5
    assert tio.get_float(f, 3) == 1.5
    assert tio.get_bytes(f, 4) == b"seg-1"
    assert tio.get_varint(f, 5) == 0
    assert tio.get_varint(f, 99, default=7) == 7


def test_proto_repeated_packed_and_unpacked():
    vals = [0.5, -1.25, 3.0]
    packed = tio.field_packed_doubles(1, vals)
    unpacked = b"".join(tio.field_double(1, v) for v in vals)
    for buf in (packed, unpacked):
        np.testing.assert_allclose(
            tio.repeated_double(tio.parse_fields(buf), 1), vals)
    ints = [0, 1, 127, 128, 2 ** 40]
    for buf in (tio.field_packed_varints(2, ints),
                b"".join(tio.field_varint(2, v) for v in ints)):
        assert tio.repeated_varint(tio.parse_fields(buf), 2) == ints
    floats = [1.0, -2.5]
    for buf in (tio.field_packed_floats(3, floats),
                b"".join(tio.field_float(3, v) for v in floats)):
        np.testing.assert_allclose(
            tio.repeated_float(tio.parse_fields(buf), 3), floats)


def test_proto_nested_messages():
    inner = tio.field_varint(1, 5)
    buf = tio.field_bytes(7, inner) + tio.field_bytes(7, tio.field_varint(1, 9))
    f = tio.parse_fields(buf)
    assert [tio.get_varint(m, 1) for m in tio.iter_messages(f, 7)] == [5, 9]
    assert tio.get_varint(tio.get_message(f, 7), 1) == 5


# -------------------------------------------------------- geometry oracle

def _range_image(h, w):
    """[h, w, 4] zeros (range, intensity, elongation, nlz)."""
    return np.zeros((h, w, 4), np.float32)


def test_unprojection_identity_extrinsic():
    # One pixel at known azimuth/inclination, identity extrinsic.
    h, w = 2, 8
    incl = np.array([-0.1, 0.3])               # ascending; row 0 <- 0.3
    ri = _range_image(h, w)
    r = 10.0
    ri[0, 2, 0] = r                             # row 0 -> inclination 0.3
    ri[0, 2, 1:4] = (0.7, 0.2, -1.0)
    pts, feats = wd.range_image_to_point_cloud(ri, np.eye(4), incl)
    assert pts.shape == (1, 3) and feats.shape == (1, 3)
    az = ((w - 0.5 - 2) / w * 2.0 - 1.0) * np.pi
    expect = r * np.array([np.cos(az) * np.cos(0.3),
                           np.sin(az) * np.cos(0.3), np.sin(0.3)])
    np.testing.assert_allclose(pts[0], expect, atol=1e-5)
    np.testing.assert_allclose(feats[0], (0.7, 0.2, -1.0), atol=1e-6)


def test_unprojection_extrinsic_rotation_translation():
    # 90-deg yaw + translation; azimuth correction must cancel the yaw so
    # the same pixel lands rotated+shifted.
    h, w = 1, 4
    incl = np.array([0.0])
    ri = _range_image(h, w)
    ri[0, 1, 0] = 5.0
    yaw = np.pi / 2
    ext = np.eye(4)
    ext[:3, :3] = [[np.cos(yaw), -np.sin(yaw), 0],
                   [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
    ext[:3, 3] = (1.0, 2.0, 3.0)
    pts0, _ = wd.range_image_to_point_cloud(ri, np.eye(4), incl)
    pts, _ = wd.range_image_to_point_cloud(ri, ext, incl)
    # sensor-frame direction is rotated by -yaw (azimuth correction), then
    # the extrinsic rotates it back: the world azimuth is unchanged and
    # only the translation moves the point.
    np.testing.assert_allclose(pts[0], pts0[0] + ext[:3, 3], atol=1e-5)


def test_unprojection_pixel_pose_roundtrip():
    # pixel pose == frame pose: global -> vehicle inverse must reproduce
    # the pose-free result exactly.
    h, w = 2, 4
    incl = np.array([-0.2, 0.1])
    ri = _range_image(h, w)
    ri[:, :, 0] = np.random.default_rng(0).uniform(1, 50, (h, w))
    yaw, t = 0.7, np.array([10.0, -4.0, 1.5])
    pose = np.eye(4)
    pose[:3, :3] = [[np.cos(yaw), -np.sin(yaw), 0],
                    [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
    pose[:3, 3] = t
    # [h, w, 6] (roll, pitch, yaw, x, y, z) all equal to the frame pose
    pix = np.zeros((h, w, 6))
    pix[..., 2] = yaw
    pix[..., 3:] = t
    base, _ = wd.range_image_to_point_cloud(ri, np.eye(4), incl)
    via_pose, _ = wd.range_image_to_point_cloud(
        ri, np.eye(4), incl, pixel_pose=pix, frame_pose=pose)
    np.testing.assert_allclose(via_pose, base, atol=1e-4)


def test_pixel_pose_rotation_matrix_composition():
    rot, trans = wd._pixel_pose_to_transform(
        np.array([[[0.3, -0.2, 1.1, 1.0, 2.0, 3.0]]]))
    r, p, y = 0.3, -0.2, 1.1
    Rx = np.array([[1, 0, 0], [0, np.cos(r), -np.sin(r)],
                   [0, np.sin(r), np.cos(r)]])
    Ry = np.array([[np.cos(p), 0, np.sin(p)], [0, 1, 0],
                   [-np.sin(p), 0, np.cos(p)]])
    Rz = np.array([[np.cos(y), -np.sin(y), 0],
                   [np.sin(y), np.cos(y), 0], [0, 0, 1]])
    np.testing.assert_allclose(rot[0, 0], Rz @ Ry @ Rx, atol=1e-12)
    np.testing.assert_allclose(trans[0, 0], (1.0, 2.0, 3.0))


def test_compute_inclination_uniform():
    incl = wd.compute_inclination(-1.0, 1.0, 4)
    np.testing.assert_allclose(incl, [-0.75, -0.25, 0.25, 0.75])


# ------------------------------------------------------------ frame decode

def _fab_frame(nlz_row0=False, pose=None, two_lasers=False,
               second_return=False, top_pose=False):
    h, w = 2, 4
    ri = _range_image(h, w)
    ri[0, 1, :] = (4.0, 0.5, 0.1, -1.0)
    ri[1, 3, :] = (9.0, 0.9, 0.0, 1.0 if nlz_row0 else -1.0)
    lasers = {wd.LASER_TOP: {"ri_return1": ri}}
    if second_return:
        ri2 = _range_image(h, w)
        ri2[1, 0, :] = (2.0, 0.3, 0.2, -1.0)
        lasers[wd.LASER_TOP]["ri_return2"] = ri2
    if top_pose:
        pix = np.zeros((h, w, 6), np.float32)
        lasers[wd.LASER_TOP]["pose"] = pix
    calibs = {wd.LASER_TOP: {"beam_inclinations": [-0.3, 0.3],
                             "extrinsic": np.eye(4)}}
    if two_lasers:
        ri_side = _range_image(1, 4)
        ri_side[0, 0, :] = (1.5, 0.1, 0.0, -1.0)
        lasers[2] = {"ri_return1": ri_side}
        calibs[2] = {"beam_inclination_min": -0.1,
                     "beam_inclination_max": 0.1,
                     "extrinsic": np.eye(4)}
    labels = [dict(center=(1.0, 2.0, 0.5), dims=(4.0, 1.8, 1.5),
                   heading=0.3, type=1, id="veh-0", speed=(3.0, 0.0),
                   num_lidar_points_in_box=12, detection_difficulty=1),
              dict(center=(0.0, 0.0, 0.0), dims=(1, 1, 1), heading=0.0,
                   type=0, id="unk")]
    return wd.encode_frame(
        "segctx", 123456, pose if pose is not None else np.eye(4),
        lasers, calibs, labels=labels, camera_shapes=[(886, 1920)] * 5)


def test_parse_frame_fields():
    f = wd.parse_frame(_fab_frame(two_lasers=True))
    assert f["context_name"] == "segctx"
    assert f["timestamp_micros"] == 123456
    assert f["camera_shapes"] == [(886, 1920)] * 5
    assert set(f["lasers"]) == {wd.LASER_TOP, 2}
    np.testing.assert_allclose(
        f["laser_calibrations"][wd.LASER_TOP]["beam_inclinations"],
        [-0.3, 0.3])
    assert len(f["laser_labels"]) == 2
    lab = f["laser_labels"][0]
    assert lab["id"] == "veh-0" and lab["type"] == 1
    np.testing.assert_allclose(lab["dims"], (4.0, 1.8, 1.5))
    np.testing.assert_allclose(lab["speed"], (3.0, 0.0))


def test_frame_point_cloud_ordering_and_counts():
    # lasers sorted by name; per laser return1 then return2
    # (reference waymo_utils.py:110-166: laser-major concat).
    f = wd.parse_frame(_fab_frame(two_lasers=True, second_return=True))
    pts, counts = wd.frame_point_cloud(f)
    # TOP(name=1): 2 pts return1 + 1 pt return2; side(name=2): 1 pt
    assert counts == [3, 1]
    assert pts.shape == (4, 6)
    # return1 pixel (4.0 range) precedes return2 pixel (2.0 range)
    r = np.linalg.norm(pts[:, :3], axis=1)
    assert r[0] == pytest.approx(4.0, abs=1e-4)
    assert r[2] == pytest.approx(2.0, abs=1e-4)
    assert r[3] == pytest.approx(1.5, abs=1e-4)
    # single-return mode drops the second return only
    pts1, counts1 = wd.frame_point_cloud(f, use_two_returns=False)
    assert counts1 == [2, 1] and pts1.shape == (3, 6)


def test_top_pixel_pose_applies_to_both_returns():
    # identity pixel pose + identity frame pose must be a no-op, and must
    # be applied to return 2 as well (pose proto lives on return 1).
    f_plain = wd.parse_frame(_fab_frame(second_return=True))
    f_posed = wd.parse_frame(_fab_frame(second_return=True, top_pose=True))
    pts_a, _ = wd.frame_point_cloud(f_plain)
    pts_b, _ = wd.frame_point_cloud(f_posed)
    np.testing.assert_allclose(pts_b, pts_a, atol=1e-5)


def test_generate_labels_speed_rotation():
    yaw = np.pi / 2
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
    f = wd.parse_frame(_fab_frame(pose=pose))
    annos = wd.generate_labels(f, pose=f["pose"])
    # 'unknown' class dropped
    assert list(annos["name"]) == ["Vehicle"]
    assert annos["gt_boxes_lidar"].shape == (1, 9)
    np.testing.assert_allclose(annos["gt_boxes_lidar"][0, :3], (1, 2, 0.5))
    np.testing.assert_allclose(annos["gt_boxes_lidar"][0, 3:6],
                               (4.0, 1.8, 1.5))
    # global +x speed seen from a vehicle yawed +90deg is -y... in row
    # convention: v_row @ R = (3,0,0) @ Rz(90) = (0, -3)? verify directly:
    expect = (np.array([3.0, 0.0, 0.0]) @ pose[:3, :3])[:2]
    np.testing.assert_allclose(annos["gt_boxes_lidar"][0, 7:9], expect,
                               atol=1e-6)
    assert annos["num_points_in_gt"][0] == 12


def test_generate_labels_empty():
    f = wd.parse_frame(wd.encode_frame(
        "c", 0, np.eye(4), {}, {}, labels=[]))
    annos = wd.generate_labels(f, pose=np.eye(4))
    assert annos["gt_boxes_lidar"].shape == (0, 9)


# --------------------------------------------------------- end-to-end

def _fab_tfrecord(tmp_path, n_frames=3):
    path = tmp_path / "segment-777_with_camera_labels.tfrecord"
    tio.write_tfrecord(path, [_fab_frame() for _ in range(n_frames)])
    return path


def test_decode_sequence_end_to_end(tmp_path):
    rec = _fab_tfrecord(tmp_path)
    out = tmp_path / "waymo_processed"
    infos = wd.decode_sequence(rec, out, verify_crc=True)
    assert len(infos) == 3
    seq = "segment-777_with_camera_labels"
    for i, info in enumerate(infos):
        assert info["point_cloud"] == {
            "num_features": 5, "lidar_sequence": seq, "sample_idx": i}
        assert info["frame_id"] == f"{seq}_%03d" % i
        assert info["metadata"]["context_name"] == "segctx"
        assert info["image"]["image_shape_0"] == (886, 1920)
        assert info["num_points_of_each_lidar"] == [2]
        assert info["annos"]["gt_boxes_lidar"].shape == (1, 9)
        pts = np.load(out / seq / ("%04d.npy" % i))
        assert pts.shape == (2, 6) and pts.dtype == np.float32
    assert (out / seq / f"{seq}.pkl").exists()


def test_decode_sequence_sampled_interval_and_idempotent(tmp_path):
    rec = _fab_tfrecord(tmp_path, n_frames=4)
    out = tmp_path / "proc"
    infos = wd.decode_sequence(rec, out, sampled_interval=2)
    assert [i["point_cloud"]["sample_idx"] for i in infos] == [0, 2]
    # second call must short-circuit on the pickle (skip-existing
    # idempotency, reference waymo_utils.py:203-208): corrupt the
    # tfrecord and re-decode — the cached infos still come back.
    rec.write_bytes(b"garbage")
    infos2 = wd.decode_sequence(rec, out, sampled_interval=2)
    assert len(infos2) == 2
    assert infos2[0]["frame_id"] == infos[0]["frame_id"]


def test_decoded_sequence_feeds_waymo_detection(tmp_path):
    from lvv_tpu.data.detection_dataset import WaymoDetection
    rec = _fab_tfrecord(tmp_path)
    out = tmp_path / "proc"
    infos = wd.decode_sequence(rec, out)
    ds = WaymoDetection(dataroot=str(out), infos=infos,
                        filter_empty_boxes=False,
                        point_range=(-75, -75, -5, 75, 75, 5),
                        max_points=32, max_gt=4)
    assert len(ds) == 3
    raw = ds.load_raw(0)
    # loader drops NLZ!=-1 rows and tanh-squashes intensity -> [N, 5]
    assert raw["points"].shape[1] == 5
    assert raw["points"].shape[0] == 2
    assert raw["gt_boxes"].shape == (1, 9)
    assert raw["gt_labels"][0] == WaymoDetection.CLASSES.index("Vehicle")


def test_create_waymo_infos_cli(tmp_path, monkeypatch):
    import pickle
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "create_waymo_infos",
        str(__import__("pathlib").Path(__file__).resolve().parents[1]
            / "tools" / "create_waymo_infos.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    raw = tmp_path / "raw"
    raw.mkdir()
    _fab_tfrecord(raw)
    save = tmp_path / "save"
    monkeypatch.setattr("sys.argv", [
        "create_waymo_infos.py", "--raw-dir", str(raw), "--save-dir",
        str(save), "--splits", "train", "--verify-crc", "--with-gt-db",
        "--gt-db-min-points", "1"])
    assert mod.main() == 0
    db = pickle.loads((save / "waymo_gt_database_train.pkl").read_bytes())
    assert len(db["classes"]["Vehicle"]) == 3   # one car per frame
    import pickle
    infos = pickle.loads((save / "waymo_infos_train.pkl").read_bytes())
    assert len(infos) == 3
    seq = infos[0]["point_cloud"]["lidar_sequence"]
    assert (save / "waymo_processed_data" / seq / "0000.npy").exists()


def test_waymo_multiframe_sequence_accumulation(tmp_path):
    """get_sequence_data parity (reference waymo_dataset.py:250-337):
    prior frames transform lidar->global->current-lidar, gain a 0.1 s/step
    timestamp channel, and drop ego-radius points; counts are per frame."""
    from lvv_tpu.data.detection_dataset import WaymoDetection
    seq_dir = tmp_path / "proc" / "seg-m"
    seq_dir.mkdir(parents=True)
    # a static GLOBAL point at (10, 0, 1); ego advances +2 m in x per frame
    infos = []
    for i in range(3):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 2.0 * i
        # vehicle-frame coordinates of the static point + one ego point
        pts = np.zeros((2, 6), np.float32)
        pts[0, :3] = (10.0 - 2.0 * i, 0.0, 1.0)
        pts[1, :3] = (0.2, 0.2, 0.0)            # inside the ego radius
        pts[:, 5] = -1
        np.save(seq_dir / ("%04d.npy" % i), pts)
        infos.append({"point_cloud": {"num_features": 5,
                                      "lidar_sequence": "seg-m",
                                      "sample_idx": i},
                      "frame_id": f"seg-m_{i:03d}", "pose": pose})
    ds = WaymoDetection(dataroot=str(tmp_path / "proc"), infos=infos,
                        sequence_offsets=(-2, 0),
                        point_range=(-75, -75, -5, 75, 75, 5),
                        max_points=16, max_gt=4)
    raw = ds.load_raw(2)
    pts, counts = raw["points"], raw["frame_counts"]
    # ego-radius removal runs in CURRENT-frame coords (reference
    # get_sequence_data:261-263,313): prior ego points moved away from
    # the current ego, so nothing drops here
    assert counts.tolist() == [2, 2, 2]
    assert pts.shape == (6, 6)
    # the static point lands at the SAME current-frame coords from every
    # frame: current pose x=4 -> local (6, 0, 1); order cur, t-1, t-2
    np.testing.assert_allclose(pts[0, :3], (6.0, 0.0, 1.0), atol=1e-5)
    np.testing.assert_allclose(pts[2, :3], (6.0, 0.0, 1.0), atol=1e-5)
    np.testing.assert_allclose(pts[4, :3], (6.0, 0.0, 1.0), atol=1e-5)
    # prior ego points shifted back by the ego motion (2 m / frame)
    np.testing.assert_allclose(pts[3, :3], (-1.8, 0.2, 0.0), atol=1e-5)
    np.testing.assert_allclose(pts[5, :3], (-3.8, 0.2, 0.0), atol=1e-5)
    # timestamps: 0 for current, 0.1 / 0.2 for one/two frames back
    assert pts[0, 5] == 0.0 and pts[1, 5] == 0.0
    np.testing.assert_allclose(pts[2:, 5], (0.1, 0.1, 0.2, 0.2))
    # start-of-sequence clipping repeats frame 0 (reference np.clip);
    # the repeated frame IS the current one, so its ego point drops
    raw0 = ds.load_raw(0)
    assert raw0["frame_counts"].tolist() == [2, 1, 1]
    # single-frame mode unchanged: 5 features, no counts
    ds1 = WaymoDetection(dataroot=str(tmp_path / "proc"), infos=infos,
                         point_range=(-75, -75, -5, 75, 75, 5),
                         max_points=16, max_gt=4)
    assert ds1.load_raw(2)["points"].shape == (2, 5)


def test_sequence_points_feed_mppnet(tmp_path):
    """Integration: WaymoDetection multi-frame output -> fixed [T, P, F]
    stack -> MPPNetDetector forward (the reference's
    waymo multi-frame SEQUENCE_CONFIG -> mppnet_head path)."""
    import jax
    import jax.numpy as jnp
    from lvv_tpu.config import tiny_config
    from lvv_tpu.data.detection_dataset import (WaymoDetection,
                                                stack_sequence_frames)
    from lvv_tpu.models.mppnet import MPPNetDetector

    seq_dir = tmp_path / "proc" / "seg-q"
    seq_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    infos = []
    for i in range(3):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 2.0 * i
        pts = np.zeros((40, 6), np.float32)
        pts[:, :3] = rng.uniform(-30, 30, (40, 3))
        pts[:, 5] = -1
        np.save(seq_dir / ("%04d.npy" % i), pts)
        infos.append({"point_cloud": {"num_features": 5,
                                      "lidar_sequence": "seg-q",
                                      "sample_idx": i},
                      "frame_id": f"seg-q_{i:03d}", "pose": pose})
    ds = WaymoDetection(dataroot=str(tmp_path / "proc"), infos=infos,
                        sequence_offsets=(-2, 0),
                        point_range=(-75, -75, -40, 75, 75, 40),
                        max_points=256, max_gt=4)
    raw = ds.load_raw(2)
    stack, counts = stack_sequence_frames(raw["points"],
                                          raw["frame_counts"], 64)
    assert stack.shape == (3, 64, 6) and counts.tolist() == [40, 40, 40]
    # truncation clips counts
    _, kept = stack_sequence_frames(raw["points"], raw["frame_counts"], 16)
    assert kept.tolist() == [16, 16, 16]

    cfg = tiny_config()
    from lvv_tpu.models.voxelnext import Detections
    props = Detections(
        boxes=jnp.zeros((4, 9)).at[0].set(
            jnp.asarray([5.0, 0.0, 0.0, 3, 3, 3, 0.0, 0, 0])),
        scores=jnp.asarray([0.9, 0, 0, 0.0]),
        labels=jnp.asarray([0, -1, -1, -1]),
        count=jnp.int32(1))
    m = MPPNetDetector(det_cfg=cfg.model.voxelnext, num_frames=3,
                       samples=8)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(stack),
                    jnp.asarray(counts), props)
    dets = m.apply(params, jnp.asarray(stack), jnp.asarray(counts), props)
    assert np.isfinite(np.asarray(dets.boxes)).all()



def test_sequence_mode_getitem_preserves_frames(tmp_path):
    """__getitem__ in sequence mode must keep frame-contiguous layout and
    clip frame_counts consistently with point padding (code-review fix:
    the base pipeline's shuffle/range-mask would scramble per-frame
    grouping and drop frame_counts)."""
    from lvv_tpu.data.detection_dataset import (WaymoDetection,
                                                stack_sequence_frames)
    seq_dir = tmp_path / "proc" / "seg-g"
    seq_dir.mkdir(parents=True)
    infos = []
    for i in range(2):
        pose = np.eye(4, dtype=np.float32)
        pts = np.zeros((10, 6), np.float32)
        pts[:, 0] = np.arange(10) + 100 * i     # frame-identifying x
        pts[:, 5] = -1
        np.save(seq_dir / ("%04d.npy" % i), pts)
        infos.append({"point_cloud": {"num_features": 5,
                                      "lidar_sequence": "seg-g",
                                      "sample_idx": i},
                      "frame_id": f"seg-g_{i:03d}", "pose": pose})
    ds = WaymoDetection(dataroot=str(tmp_path / "proc"), infos=infos,
                        sequence_offsets=(-1, 0),
                        point_range=(-500, -500, -5, 500, 500, 5),
                        max_points=15, max_gt=4)
    s = ds[1]
    # 10 current + 10 prior, padded capacity 15 -> prior clipped to 5
    assert s["frame_counts"].tolist() == [10, 5]
    assert int(s["num_points"]) == 15
    # frame-contiguous: first 10 rows are frame 1 (x in [100, 110))
    assert (s["points"][:10, 0] >= 100).all()
    assert (s["points"][10:15, 0] < 10).all()
    stack, kept = stack_sequence_frames(
        s["points"][:int(s["num_points"])], s["frame_counts"], 12)
    assert stack.shape == (2, 12, 6) and kept.tolist() == [10, 5]


def test_create_waymo_infos_multisplit_guard(tmp_path, monkeypatch):
    """Without ImageSets lists, multi-split decode would leak train data
    into val — the CLI must refuse (code-review fix)."""
    import importlib.util, pathlib
    spec = importlib.util.spec_from_file_location(
        "create_waymo_infos_guard",
        str(pathlib.Path(__file__).resolve().parents[1] / "tools"
            / "create_waymo_infos.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    raw = tmp_path / "raw"
    raw.mkdir()
    _fab_tfrecord(raw)
    monkeypatch.setattr("sys.argv", [
        "create_waymo_infos.py", "--raw-dir", str(raw), "--save-dir",
        str(tmp_path / "save")])          # default --splits train val
    with pytest.raises(SystemExit):
        mod.main()
