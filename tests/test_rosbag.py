"""ROS1 bag reader: parse a hand-built v2.0 bag (spec-conformant writer in
the test) and recover images + transforms (reference: data_extract.py)."""
import struct

import numpy as np
import pytest

from touchgs_tpu.data.rosbag import BagReader, extract_images_and_tf


def _field(name: bytes, value: bytes) -> bytes:
    f = name + b"=" + value
    return struct.pack("<I", len(f)) + f


def _record(fields: dict[bytes, bytes], data: bytes) -> bytes:
    header = b"".join(_field(k, v) for k, v in fields.items())
    return (struct.pack("<I", len(header)) + header
            + struct.pack("<I", len(data)) + data)


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _ros_header(seq=0, sec=7, nsec=500, frame="cam") -> bytes:
    return struct.pack("<III", seq, sec, nsec) + _string(frame)


def _image_msg(h, w, value=128) -> bytes:
    data = np.full((h, w), value, np.uint8).tobytes()
    return (_ros_header() + struct.pack("<II", h, w) + _string("mono8")
            + b"\x00" + struct.pack("<I", w) + struct.pack("<I", len(data))
            + data)


def _tf_msg() -> bytes:
    one = (_ros_header(frame="world") + _string("gripper")
           + struct.pack("<ddd", 1.0, 2.0, 3.0)
           + struct.pack("<dddd", 0.0, 0.0, 0.0, 1.0))  # qx qy qz qw
    return struct.pack("<I", 1) + one


def _connection(conn: int, topic: str, mtype: str) -> bytes:
    sub = _field(b"type", mtype.encode()) + _field(b"md5sum", b"x" * 32)
    return _record(
        {b"op": b"\x07", b"conn": struct.pack("<I", conn),
         b"topic": topic.encode()}, sub)


def _message(conn: int, payload: bytes) -> bytes:
    return _record(
        {b"op": b"\x02", b"conn": struct.pack("<I", conn),
         b"time": struct.pack("<II", 7, 0)}, payload)


@pytest.fixture
def bag_path(tmp_path):
    body = (
        _connection(0, "/camera/image_raw", "sensor_msgs/Image")
        + _connection(1, "/tf", "tf2_msgs/TFMessage")
        + _message(0, _image_msg(4, 6, value=200))
        + _message(1, _tf_msg())
        + _message(0, _image_msg(4, 6, value=50))
    )
    p = tmp_path / "capture.bag"
    p.write_bytes(b"#ROSBAG V2.0\n" + body)
    return p


def test_reader_connections_and_messages(bag_path):
    reader = BagReader(bag_path)
    assert reader.connections[0]["topic"] == "/camera/image_raw"
    assert reader.connections[1]["type"] == "tf2_msgs/TFMessage"
    msgs = list(reader.messages())
    assert len(msgs) == 3
    topic, mtype, img = msgs[0]
    assert topic == "/camera/image_raw"
    assert img["data"].shape == (4, 6)
    assert int(img["data"][0, 0]) == 200
    _, _, tfs = msgs[1]
    np.testing.assert_allclose(tfs[0]["translation"], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(tfs[0]["rotation_wxyz"], [1.0, 0, 0, 0])
    assert tfs[0]["child_frame_id"] == "gripper"


def test_topic_filter(bag_path):
    reader = BagReader(bag_path)
    only_tf = list(reader.messages({"/tf"}))
    assert len(only_tf) == 1 and only_tf[0][0] == "/tf"


def test_extract_images_and_tf(bag_path, tmp_path):
    out = extract_images_and_tf(bag_path, "/camera/image_raw",
                                tmp_path / "out")
    assert len(out["images"]) == 2
    assert len(out["transforms"]) == 1
    from PIL import Image
    arr = np.asarray(Image.open(out["images"][1]))
    assert arr.shape == (4, 6) and int(arr[0, 0]) == 50
    poses = np.load(tmp_path / "out" / "tf_poses.npy")
    assert poses.shape == (1, 7)


def test_rejects_non_bag(tmp_path):
    p = tmp_path / "not.bag"
    p.write_bytes(b"nope")
    with pytest.raises(ValueError):
        BagReader(p)
