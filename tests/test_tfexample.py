"""tf.train.Example codec: round-trips + cross-validation against a real
protobuf implementation of the Example schema (built dynamically with
google.protobuf, independent of our hand-rolled wire codec)."""

import numpy as np
import pytest

from gigl_tpu.data.tfexample import (
    decode_example,
    encode_example,
    read_examples,
    write_examples,
)


@pytest.fixture(scope="module")
def proto_example_cls():
    """Build the real Example message class from the TF proto schema."""
    from google.protobuf import (
        descriptor_pb2,
        descriptor_pool,
        message_factory,
    )

    pool = descriptor_pool.DescriptorPool()
    f = descriptor_pb2.FileDescriptorProto()
    f.name = "example_test.proto"
    f.package = "tftest"
    bl = f.message_type.add(); bl.name = "BytesList"
    fd = bl.field.add(); fd.name = "value"; fd.number = 1; fd.type = 12; fd.label = 3
    fl = f.message_type.add(); fl.name = "FloatList"
    fd = fl.field.add(); fd.name = "value"; fd.number = 1; fd.type = 2; fd.label = 3
    fd.options.packed = True
    il = f.message_type.add(); il.name = "Int64List"
    fd = il.field.add(); fd.name = "value"; fd.number = 1; fd.type = 3; fd.label = 3
    fd.options.packed = True
    feat = f.message_type.add(); feat.name = "Feature"
    for n, t, num in [("bytes_list", "BytesList", 1),
                      ("float_list", "FloatList", 2),
                      ("int64_list", "Int64List", 3)]:
        fd = feat.field.add(); fd.name = n; fd.number = num; fd.type = 11
        fd.label = 1; fd.type_name = f".tftest.{t}"
    feats = f.message_type.add(); feats.name = "Features"
    entry = feats.nested_type.add(); entry.name = "FeatureEntry"
    entry.options.map_entry = True
    fd = entry.field.add(); fd.name = "key"; fd.number = 1; fd.type = 9; fd.label = 1
    fd = entry.field.add(); fd.name = "value"; fd.number = 2; fd.type = 11
    fd.label = 1; fd.type_name = ".tftest.Feature"
    fd = feats.field.add(); fd.name = "feature"; fd.number = 1; fd.type = 11
    fd.label = 3; fd.type_name = ".tftest.Features.FeatureEntry"
    ex = f.message_type.add(); ex.name = "Example"
    fd = ex.field.add(); fd.name = "features"; fd.number = 1; fd.type = 11
    fd.label = 1; fd.type_name = ".tftest.Features"
    pool.Add(f)
    msgs = message_factory.GetMessageClassesForFiles(
        ["example_test.proto"], pool)
    return msgs["tftest.Example"]


class TestCrossValidation:
    def test_decode_protobuf_encoded(self, proto_example_cls):
        e = proto_example_cls()
        e.features.feature["x"].float_list.value.extend([1.5, -2.0, 3.25])
        e.features.feature["id"].int64_list.value.extend([42, -7])
        e.features.feature["s"].bytes_list.value.extend([b"hi", b"there"])
        got = decode_example(e.SerializeToString())
        np.testing.assert_allclose(got["x"], [1.5, -2.0, 3.25], rtol=1e-7)
        np.testing.assert_array_equal(got["id"], [42, -7])
        assert got["s"] == [b"hi", b"there"]

    def test_protobuf_decodes_our_encoding(self, proto_example_cls):
        data = encode_example({
            "f": np.asarray([0.5, 1.5], np.float32),
            "i": np.asarray([1, 2, 3], np.int64),
            "b": [b"abc"],
        })
        e = proto_example_cls()
        e.ParseFromString(data)
        fm = e.features.feature
        assert list(fm["f"].float_list.value) == [0.5, 1.5]
        assert list(fm["i"].int64_list.value) == [1, 2, 3]
        assert list(fm["b"].bytes_list.value) == [b"abc"]


class TestRoundTrip:
    def test_all_types(self):
        row = {
            "floats": np.random.default_rng(0).normal(
                size=17).astype(np.float32),
            "ints": np.asarray([0, 1, -1, 2**40, -(2**40)], np.int64),
            "bytes": [b"", b"x" * 100],
            "scalar_f": 3.5,
            "scalar_i": 7,
        }
        got = decode_example(encode_example(row))
        np.testing.assert_allclose(got["floats"], row["floats"], rtol=1e-7)
        np.testing.assert_array_equal(got["ints"], row["ints"])
        assert got["bytes"] == row["bytes"]
        np.testing.assert_allclose(got["scalar_f"], [3.5])
        np.testing.assert_array_equal(got["scalar_i"], [7])

    def test_empty_lists(self):
        got = decode_example(encode_example({"e": []}))
        assert len(got["e"]) == 0

    def test_negative_int_varint_encoding(self):
        got = decode_example(encode_example({"i": [-1]}))
        np.testing.assert_array_equal(got["i"], [-1])


class TestFileIO:
    def test_tfrecord_file_roundtrip(self, tmp_path):
        from gigl_tpu import native

        if not native.available():
            pytest.skip("no native toolchain")
        rows = [{"x": np.asarray([float(i)], np.float32),
                 "id": np.asarray([i], np.int64)} for i in range(20)]
        path = str(tmp_path / "examples.tfrecord")
        assert write_examples(path, rows) == 20
        back = list(read_examples(path))
        assert len(back) == 20
        for i, r in enumerate(back):
            assert float(r["x"][0]) == float(i)
            assert int(r["id"][0]) == i

    @pytest.mark.slow
    def test_tensorflow_reads_our_file(self, tmp_path):
        """The gold interop test: TF's own TFRecordDataset + Example parser
        consume files written by our native codec + wire encoder."""
        tf = pytest.importorskip("tensorflow")
        from gigl_tpu import native

        if not native.available():
            pytest.skip("no native toolchain")
        rows = [{"x": np.asarray([1.5, 2.5], np.float32),
                 "id": np.asarray([7], np.int64)}]
        path = str(tmp_path / "tf.tfrecord")
        write_examples(path, rows)
        ds = tf.data.TFRecordDataset(path)
        rec = next(iter(ds)).numpy()
        ex = tf.train.Example()
        ex.ParseFromString(rec)
        assert list(ex.features.feature["x"].float_list.value) == [1.5, 2.5]
        assert list(ex.features.feature["id"].int64_list.value) == [7]
