"""Extract the HEVC CABAC context-init table from libavcodec's rodata.

Provenance tool (mirrors extract_cabac_tables.py for H.264): the spec's
Tables 9-5..9-32 give per-syntax-element initValue lists; libavcodec
carries them concatenated as `init_values[3][HEVC_CONTEXTS]` (one row
per initType).  We LOCATE the table by an anchor of spec-known values
(sao_merge_flag=153, sao_type_idx=200, split_cu_flag I={139,141,157})
— unique in the binary — then read the exact bytes out of rodata
instead of trusting transcription, and cross-check ~20 spec-published
values before emitting.

Output: the kInitValues table in native/src/hevc/hevc_cabac_tables.h.

Run: python native/tools/extract_hevc_tables.py [path-to-libavcodec.so]
"""

import re
import sys

LIB = sys.argv[1] if len(sys.argv) > 1 else \
    "/lib/x86_64-linux-gnu/libavcodec.so.59"
N = 199  # HEVC_CONTEXTS in lavc 59 (includes range-extension contexts)

# context offsets within a row, in libavcodec's element order (verified
# against spec init tables; see CHECKS below)
LAYOUT = [
    ("SAO_MERGE_FLAG", 0, 1),
    ("SAO_TYPE_IDX", 1, 1),
    ("SPLIT_CU_FLAG", 2, 3),
    ("CU_TRANSQUANT_BYPASS", 5, 1),
    ("CU_SKIP_FLAG", 6, 3),
    ("CU_QP_DELTA", 9, 3),
    ("PRED_MODE_FLAG", 12, 1),
    ("PART_MODE", 13, 4),
    ("PREV_INTRA_LUMA_PRED", 17, 1),
    ("INTRA_CHROMA_PRED_MODE", 18, 2),
    ("MERGE_FLAG", 20, 1),
    ("MERGE_IDX", 21, 1),
    ("INTER_PRED_IDC", 22, 5),
    # lavc keeps per-list slots for ref_idx / mvd flags but decodes both
    # lists through the L0 offsets (spec shares these contexts):
    ("REF_IDX_L0", 27, 2),
    ("REF_IDX_L1", 29, 2),          # unused copy (same init values)
    ("ABS_MVD_GREATER0", 31, 1),
    ("ABS_MVD_GREATER1", 32, 1),
    ("ABS_MVD_COPY_L1", 33, 2),     # unused per-list copy pair
    ("MVP_FLAG", 35, 1),
    ("NO_RESIDUAL_DATA", 36, 1),
    ("SPLIT_TRANSFORM_FLAG", 37, 3),
    ("CBF_LUMA", 40, 2),
    ("CBF_CB_CR", 42, 5),
    ("TRANSFORM_SKIP", 47, 2),
    ("RDPCM_FLAG", 49, 2),
    ("RDPCM_DIR", 51, 2),
    ("LAST_SIG_X_PREFIX", 53, 18),
    ("LAST_SIG_Y_PREFIX", 71, 18),
    ("SIG_COEFF_GROUP", 89, 4),
    ("SIG_COEFF_FLAG", 93, 44),
    ("COEFF_ABS_GREATER1", 137, 24),
    ("COEFF_ABS_GREATER2", 161, 6),
    ("LOG2_RES_SCALE", 167, 8),
    ("RES_SCALE_SIGN", 175, 2),
    ("CU_CHROMA_QP_OFFSET", 177, 2),
]

# spec-published values to cross-check the located table (element, type,
# values) — a transcription error in the anchor would fail here
CHECKS = [
    ("MERGE_FLAG", 1, [110]),
    ("MERGE_IDX", 1, [122]),
    ("INTER_PRED_IDC", 1, [95, 79, 63, 31, 31]),
    ("REF_IDX_L0", 1, [153, 153]),
    ("ABS_MVD_GREATER0", 1, [140]),
    ("ABS_MVD_GREATER0", 2, [169]),
    ("ABS_MVD_GREATER1", 1, [198]),
    ("MVP_FLAG", 1, [168]),
    ("NO_RESIDUAL_DATA", 1, [79]),
    ("SAO_TYPE_IDX", 1, [185]),
    ("SAO_TYPE_IDX", 2, [160]),
    ("SPLIT_CU_FLAG", 1, [107, 139, 126]),
    ("CU_SKIP_FLAG", 1, [197, 185, 201]),
    ("PRED_MODE_FLAG", 1, [149]),
    ("PREV_INTRA_LUMA_PRED", 0, [184]),
    ("INTRA_CHROMA_PRED_MODE", 0, [63, 139]),
    ("SPLIT_TRANSFORM_FLAG", 0, [153, 138, 138]),
    ("CBF_LUMA", 0, [111, 141]),
    ("SIG_COEFF_GROUP", 0, [91, 171, 134, 141]),
    ("COEFF_ABS_GREATER2", 0, [138, 153, 136, 167, 152, 152]),
]


def main():
    data = open(LIB, "rb").read()
    anchor = bytes([153, 200, 139, 141, 157])
    offs = [m.start() for m in re.finditer(re.escape(anchor), data)]
    assert len(offs) == 1, f"anchor not unique: {offs}"
    base = offs[0]
    rows = [list(data[base + t * N : base + (t + 1) * N]) for t in range(3)]
    assert rows[1][0] == 153 and rows[1][1] == 185, "initType1 misaligned"
    assert rows[2][0] == 153 and rows[2][1] == 160, "initType2 misaligned"
    lut = {name: (off, n) for name, off, n in LAYOUT}
    for name, t, vals in CHECKS:
        off, n = lut[name]
        got = rows[t][off : off + len(vals)]
        assert got == vals, f"{name} initType{t}: {got} != {vals}"
    print(f"// extracted from {LIB} rodata @0x{base:x} (anchored,")
    print("// spec-cross-checked); see native/tools/extract_hevc_tables.py")
    print(f"inline constexpr uint8_t kInitValues[3][{N}] = {{")
    for t in range(3):
        body = ", ".join(str(v) for v in rows[t])
        print(f"  {{{body}}},")
    print("};")


if __name__ == "__main__":
    main()
