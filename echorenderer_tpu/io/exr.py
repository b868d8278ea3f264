"""Minimal OpenEXR codec: uncompressed 32-bit-float scanline images.

The reference saves/loads EXR through ImageMagick (InOut/Images/
MagickSerializer.cs); no EXR codec library ships in this environment, so
this implements the subset of the spec needed for HDR interchange: single-
part scanline files, FLOAT or HALF channels, compression NONE (written) /
NONE accepted (read). Channel names R, G, B (+ A).

Format reference: OpenEXR file layout (openexr.org documentation) —
magic 0x762f3101, version 2, attribute list, scanline offset table,
then per-scanline blocks of (y:int32, size:int32, data by channel).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

_MAGIC = 0x01312F76


def _attr(name: str, type_name: str, data: bytes) -> bytes:
    return (
        name.encode() + b"\x00" + type_name.encode() + b"\x00"
        + struct.pack("<i", len(data)) + data
    )


def _channel_list(names, pixel_type: int) -> bytes:
    # pixel_type: 1 = HALF, 2 = FLOAT
    out = b""
    for n in sorted(names):  # EXR requires alphabetical channel order
        out += n.encode() + b"\x00" + struct.pack("<iBBBBi", pixel_type, 0, 0, 0, 0, 1)
        out += struct.pack("<i", 1)
    return out + b"\x00"


def save_exr(path, image: np.ndarray, *, flip_y: bool = True):
    """Write an (H, W, 3|4) float image as an uncompressed FLOAT EXR."""
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    if flip_y:
        img = img[::-1]  # EXR scanlines go top-down; our row 0 is bottom
    h, w, c = img.shape
    names = ["R", "G", "B", "A"][:c]

    header = b""
    header += _attr("channels", "chlist", _channel_list(names, 2))
    header += _attr("compression", "compression", b"\x00")  # NONE
    header += _attr("dataWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr("displayWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr("lineOrder", "lineOrder", b"\x00")  # increasing y
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"  # end of header

    preamble = struct.pack("<II", _MAGIC, 2)
    offset0 = len(preamble) + len(header) + 8 * h
    block_size = 8 + c * w * 4
    offsets = struct.pack("<" + "Q" * h, *(offset0 + i * block_size for i in range(h)))

    blocks = bytearray()
    order = np.argsort(names)  # data stored in alphabetical channel order
    for y in range(h):
        blocks += struct.pack("<ii", y, c * w * 4)
        for ci in order:
            blocks += img[y, :, ci].astype("<f4").tobytes()
    Path(path).write_bytes(preamble + header + offsets + bytes(blocks))


def _read_attrs(blob: bytes, pos: int):
    attrs = {}
    while blob[pos] != 0:
        name_end = blob.index(b"\x00", pos)
        name = blob[pos:name_end].decode()
        pos = name_end + 1
        type_end = blob.index(b"\x00", pos)
        type_name = blob[pos:type_end].decode()
        pos = type_end + 1
        (size,) = struct.unpack_from("<i", blob, pos)
        pos += 4
        attrs[name] = (type_name, blob[pos : pos + size])
        pos += size
    return attrs, pos + 1


def load_exr(path, *, flip_y: bool = True) -> np.ndarray:
    """Read an uncompressed scanline EXR (FLOAT or HALF channels)."""
    blob = Path(path).read_bytes()
    magic, version = struct.unpack_from("<II", blob, 0)
    if magic != _MAGIC:
        raise ValueError("not an EXR file")
    if version & 0x200:
        raise ValueError("multi-part EXR not supported")
    attrs, pos = _read_attrs(blob, 8)

    if attrs["compression"][1][0] != 0:
        raise ValueError("only uncompressed EXR supported")
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1

    # channels
    chl = attrs["channels"][1]
    channels = []
    cpos = 0
    while chl[cpos] != 0:
        nend = chl.index(b"\x00", cpos)
        cname = chl[cpos:nend].decode()
        ptype = struct.unpack_from("<i", chl, nend + 1)[0]
        channels.append((cname, ptype))
        cpos = nend + 1 + 16
    names = [c[0] for c in channels]

    pos += 8 * h  # skip the offset table; blocks are sequential
    out = np.zeros((h, w, len(channels)), np.float32)
    for _ in range(h):
        y, size = struct.unpack_from("<ii", blob, pos)
        pos += 8
        for cname, ptype in channels:  # stored alphabetically = channels order
            if ptype == 2:  # FLOAT
                row = np.frombuffer(blob, "<f4", w, pos)
                pos += 4 * w
            elif ptype == 1:  # HALF
                row = np.frombuffer(blob, "<f2", w, pos).astype(np.float32)
                pos += 2 * w
            else:
                raise ValueError(f"unsupported pixel type {ptype}")
            out[y - y0, :, names.index(cname)] = row

    # reorder alphabetical -> RGBA
    want = [n for n in ["R", "G", "B", "A"] if n in names]
    if want:
        out = out[..., [names.index(n) for n in want]]
    return out[::-1] if flip_y else out
