"""Hand-assemble reference-format fixture files for byte-level interop tests.

Every byte written here is packed with ``struct`` straight from the C++
writers' byte layout — NONE of this repo's writers are used — so parsing
these files with the repo's readers is a true cross-implementation check
(a reader bug mirrored in the writer cannot hide).

Layouts transcribed from the reference:
  * .srtr binary  — RTree.cpp:3063-3094 (exportFile)
  * legacy text   — RTree.cpp:3017-3047 (commented writer / text loader)
  * .partmap      — RTree.cpp:3465-3509 (readPartMap)
  * .depth RLE    — Util.cpp:219-247 (writeDepth) / 176-209 (readDepth)
  * mocap bank    — AvatarPoseSequence.cpp:10-45 (getFrame + meta parse)

Run from the repo root:  python scripts/make_interop_fixtures.py
"""

import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "fixtures")


def srtr_binary():
    """3-node tree: internal root + 2 leaves, numParts=3.

    RTree.cpp:3064-3093: 'R', u32 nNodes, u32 nLeafs, i32 numParts; per
    node u8 flag (0 internal / 255 leaf); internal: i32 lnode, i32 rnode,
    f32 thresh, f32 u[2], f32 v[2]; leaf: u8 cnt then cnt x (u8 part,
    f32 prob) sparse nonzeros; 'T' end marker.  Little-endian.
    """
    out = bytearray()
    out += b"R"
    out += struct.pack("<II", 3, 2)          # nNodes, nLeafs
    out += struct.pack("<i", 3)              # numParts
    # node 0: internal, children 1/2, thresh 0.5, u=(1.5,-2), v=(0.25,3)
    out += struct.pack("<B", 0)
    out += struct.pack("<iif", 1, 2, 0.5)
    out += struct.pack("<ff", 1.5, -2.0)
    out += struct.pack("<ff", 0.25, 3.0)
    # node 1: leaf, dist [0.75, 0, 0.25] -> cnt=2, sparse (0,0.75),(2,0.25)
    out += struct.pack("<B", 255)
    out += struct.pack("<B", 2)
    out += struct.pack("<Bf", 0, 0.75)
    out += struct.pack("<Bf", 2, 0.25)
    # node 2: leaf, dist [0, 1, 0] -> cnt=1, sparse (1,1.0)
    out += struct.pack("<B", 255)
    out += struct.pack("<B", 1)
    out += struct.pack("<Bf", 1, 1.0)
    out += b"T"
    with open(os.path.join(OUT, "ref_tree.srtr"), "wb") as f:
        f.write(bytes(out))


def srtr_legacy_text():
    """Same tree in the legacy whitespace text format (RTree.cpp:3017-3047):
    nNodes nLeafs numParts; per node: leafid [lnode rnode thresh u0 u1 v0
    v1 if internal]; then nLeafs rows of numParts floats."""
    txt = (
        "3 2 3\n"
        " -1  1 2 0.5 1.5 -2.0 0.25 3.0\n"
        " 0\n"
        " 1\n"
        " 0.75 0 0.25\n"
        " 0 1 0\n"
    )
    with open(os.path.join(OUT, "ref_tree_legacy.srtr"), "w") as f:
        f.write(txt)


def partmap():
    """RTree.cpp:3465-3509: 'partmap <type>', 'src N' + N names,
    'dest M' + M names, then N (oldName, newName) pairs.  Note the pairs
    need not be in src order — the reader maps through oldEnum."""
    txt = (
        "partmap contiguous\n"
        "src 4\n"
        "head torso lhand rhand\n"
        "dest 2\n"
        "upper lower\n"
        "torso lower\n"
        "head upper\n"
        "lhand upper\n"
        "rhand lower\n"
    )
    with open(os.path.join(OUT, "ref_tree.srtr.partmap"), "w") as f:
        f.write(txt)


def depth_rle():
    """3x4 depth image with interior zero runs AND an unflushed trailing
    zero run (Util.cpp:219-247 never flushes the final zrun):

        1.5  0    0    2.5
        0    3.25 4.0  0
        0    0    0    0

    -> u16 rows=3, u16 cols=4, floats [1.5, -2, 2.5, -1, 3.25, 4.0].
    """
    out = bytearray()
    out += struct.pack("<HH", 3, 4)
    for v in (1.5, -2.0, 2.5, -1.0, 3.25, 4.0):
        out += struct.pack("<f", v)
    with open(os.path.join(OUT, "ref_frame.depth"), "wb") as f:
        f.write(bytes(out))


def mocap():
    """2-joint, 2-frame pose bank (AvatarPoseSequence.cpp:10-45).

    Frame = frameSize f64: [p(3) | per-joint quaternion coeffs x,y,z,w
    (Eigen coeffs order, AvatarPoseSequence.cpp:53-57)].
    frameSize = 3 + 4*2 = 11 doubles = 88 bytes.
    Meta .txt: nSubseq numFrames frameSizeBytes, then per subsequence
    "startByte name" (start is a BYTE offset divided by frameSizeBytes).
    """
    import math

    s = math.sqrt(0.5)
    f0 = [0.5, -0.25, 2.0,
          0.0, 0.0, 0.0, 1.0,        # identity
          0.0, 0.0, s, s]            # 90 deg about +z
    f1 = [1.0, 0.0, 2.5,
          s, 0.0, 0.0, s,            # 90 deg about +x
          0.0, 1.0, 0.0, 0.0]        # 180 deg about +y
    out = bytearray()
    for fr in (f0, f1):
        for v in fr:
            out += struct.pack("<d", v)
    with open(os.path.join(OUT, "ref_mocap.dat"), "wb") as f:
        f.write(bytes(out))
    with open(os.path.join(OUT, "ref_mocap.dat.txt"), "w") as f:
        f.write("2 2 88\n0 walk\n88 run\n")


def main():
    os.makedirs(OUT, exist_ok=True)
    srtr_binary()
    srtr_legacy_text()
    partmap()
    depth_rle()
    mocap()
    print("fixtures written to", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
