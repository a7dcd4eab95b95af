import numpy as np
import pytest

from lap_tpu.data import rotation, tfrecord


def test_tfrecord_roundtrip(tmp_path):
    path = tmp_path / "test.tfrecord"
    records = [b"hello", b"world" * 100, b""]
    tfrecord.write_tfrecords(path, records)
    out = list(tfrecord.read_tfrecords(path, verify_crc=True))
    assert out == records


def test_example_roundtrip():
    features = {
        "obs/image": b"\x89PNG fake bytes",
        "actions": np.array([0.1, -0.2, 0.3], np.float32),
        "steps": np.array([1, 2, -3], np.int64),
        "name": "droid",
    }
    buf = tfrecord.build_example(features)
    parsed = tfrecord.parse_example(buf)
    assert parsed["obs/image"] == [b"\x89PNG fake bytes"]
    np.testing.assert_allclose(parsed["actions"], features["actions"], rtol=1e-6)
    np.testing.assert_array_equal(parsed["steps"], features["steps"])
    assert parsed["name"] == [b"droid"]


@pytest.mark.skipif(
    not pytest.importorskip("tensorflow", reason="tf not installed"),
    reason="tensorflow unavailable",
)
def test_example_matches_tensorflow():
    """Our Example codec must interop with real TF protos both ways."""
    import tensorflow as tf

    ex = tf.train.Example(
        features=tf.train.Features(
            feature={
                "f": tf.train.Feature(float_list=tf.train.FloatList(value=[1.5, -2.5])),
                "i": tf.train.Feature(int64_list=tf.train.Int64List(value=[7, -9])),
                "b": tf.train.Feature(bytes_list=tf.train.BytesList(value=[b"xy"])),
            }
        )
    )
    parsed = tfrecord.parse_example(ex.SerializeToString())
    np.testing.assert_allclose(parsed["f"], [1.5, -2.5])
    np.testing.assert_array_equal(parsed["i"], [7, -9])
    assert parsed["b"] == [b"xy"]

    # And TF can parse ours.
    ours = tfrecord.build_example({"f": np.array([1.5, -2.5], np.float32), "b": b"xy"})
    theirs = tf.train.Example.FromString(ours)
    assert list(theirs.features.feature["f"].float_list.value) == [1.5, -2.5]
    assert theirs.features.feature["b"].bytes_list.value[0] == b"xy"


def test_rotation_conventions():
    rng = np.random.default_rng(0)
    euler = rng.uniform(-1.2, 1.2, (10, 3))
    mat = rotation.euler_to_matrix(euler)
    back = rotation.matrix_to_euler(mat)
    np.testing.assert_allclose(back, euler, atol=1e-9)
    # Matches scipy extrinsic xyz.
    from scipy.spatial.transform import Rotation as R

    np.testing.assert_allclose(mat, R.from_euler("xyz", euler).as_matrix(), atol=1e-12)


def test_euler_diff_composition():
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (5, 3))
    b = rng.uniform(-1, 1, (5, 3))
    rel = rotation.euler_diff(a, b)
    # R(b) @ R(rel) == R(a)
    recomposed = rotation.euler_to_matrix(b) @ rotation.euler_to_matrix(rel)
    np.testing.assert_allclose(recomposed, rotation.euler_to_matrix(a), atol=1e-9)


def test_r6_roundtrip():
    rng = np.random.default_rng(2)
    euler = rng.uniform(-1, 1, (5, 3))
    r6 = rotation.euler_to_r6(euler)
    np.testing.assert_allclose(rotation.r6_to_euler(r6), euler, atol=1e-9)


def test_sum_actions_rotation_composition():
    # Two successive +10deg yaw deltas must compose to +20deg.
    deltas = np.zeros((1, 2, 7))
    deltas[0, :, 5] = np.deg2rad(10)
    deltas[0, :, 0] = 0.01
    deltas[0, 1, 6] = 1.0
    out = rotation.sum_actions(deltas)
    np.testing.assert_allclose(out[0, 5], np.deg2rad(20), atol=1e-9)
    np.testing.assert_allclose(out[0, 0], 0.02, atol=1e-12)
    assert out[0, 6] == 1.0  # gripper takes last value


def test_sum_actions_valid_lengths():
    deltas = np.ones((1, 4, 7)) * 0.01
    deltas[..., 3:6] = 0
    out = rotation.sum_actions(deltas, valid_lengths=np.array([2]))
    np.testing.assert_allclose(out[0, 0], 0.02, atol=1e-12)


def test_gather_with_padding():
    data = np.arange(5, dtype=np.float64)[:, None]
    w = rotation.gather_with_padding(data, 3)
    assert w.shape == (5, 3, 1)
    np.testing.assert_array_equal(w[3, :, 0], [3, 4, 0])  # zero pad
    w2 = rotation.gather_with_padding(data, 3, last_value_padding=True)
    np.testing.assert_array_equal(w2[3, :, 0], [3, 4, 4])  # last-value pad
