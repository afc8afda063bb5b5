"""The pure-Python TB writer produces files TensorBoard's parser reads."""

import struct

import numpy as np

from maestro_tpu.utils.tb import SummaryWriter, _crc32c, _masked_crc


def _read_records(path):
    data = path.read_bytes()
    off, records = 0, []
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (len_crc,) = struct.unpack_from("<I", data, off + 8)
        assert len_crc == _masked_crc(data[off:off + 8])
        payload = data[off + 12 : off + 12 + length]
        (crc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert crc == _masked_crc(payload)
        records.append(payload)
        off += 12 + length + 4
    return records


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c(bytes(range(32))) == 0x46DD794E
    assert _crc32c(b"123456789") == 0xE3069283


def test_events_parse_with_tensorboardX_protos(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.75, 3)
    w.add_scalar("train/lr", 1e-4, 4)
    w.add_image("viz/rec", np.zeros((3, 8, 8), np.uint8), 5)
    w.close()

    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    assert len(records) == 4  # file_version + 2 scalars + 1 image

    from tensorboardX.proto.event_pb2 import Event

    ev = Event.FromString(records[0])
    assert ev.file_version == "brain.Event:2"
    ev = Event.FromString(records[1])
    assert ev.step == 3
    assert ev.summary.value[0].tag == "train/loss"
    assert abs(ev.summary.value[0].simple_value - 0.75) < 1e-6
    ev = Event.FromString(records[3])
    img = ev.summary.value[0].image
    assert (img.height, img.width, img.colorspace) == (8, 8, 3)
    assert img.encoded_image_string.startswith(b"\x89PNG")
