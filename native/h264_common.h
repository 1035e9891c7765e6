// Shared H.264 bitstream plumbing for the in-process encoders
// (all-I_PCM lossless tier and the CAVLC compressed tier). The reference
// delegates encoding to libav/hardware (reference src/rtpstreamer.cpp:62-93);
// this environment ships no encoder, so the native layer carries its own.
#ifndef VPTPU_H264_COMMON_H
#define VPTPU_H264_COMMON_H

#include <cstdint>
#include <cstring>

namespace vptpu {

struct BitWriter {
    uint8_t* buf;
    long cap;
    long pos = 0;      // bytes fully written (saturates at cap on overflow)
    int bit = 0;       // bits pending in acc (0..7)
    uint32_t acc = 0;  // pending sub-byte bits, right-aligned

    // n <= 32; whole bytes flush immediately so pos/bit stay accurate
    void put_bits(uint32_t v, int n) {
        uint64_t a = (uint64_t(acc) << n)
                   | (v & (n >= 32 ? 0xFFFFFFFFu : ((1u << n) - 1u)));
        int nb = bit + n;
        while (nb >= 8) {
            nb -= 8;
            if (pos < cap) buf[pos++] = uint8_t(a >> nb);
        }
        acc = uint32_t(a) & ((1u << nb) - 1u);
        bit = nb;
    }
    void put_bit(int b) { put_bits(uint32_t(b) & 1u, 1); }
    void put_ue(uint32_t v) {  // Exp-Golomb
        uint32_t x = v + 1;
        int n = 0;
        while ((x >> n) > 1) ++n;
        put_bits(0, n);
        put_bits(x, n + 1);
    }
    void put_se(int32_t v) {
        put_ue(v <= 0 ? uint32_t(-2 * v) : uint32_t(2 * v - 1));
    }
    void byte_align_zero() {
        while (bit != 0) put_bit(0);  // pcm_alignment_zero_bit
    }
    void rbsp_trailing() {
        put_bit(1);
        while (bit != 0) put_bit(0);
    }
    void put_bytes(const uint8_t* src, long n) {
        // only legal when byte-aligned (PCM samples)
        if (bit != 0 || pos + n > cap) return;
        memcpy(buf + pos, src, size_t(n));
        pos += n;
    }
};

// copy an RBSP into the output as one annex-B NAL with emulation prevention
inline long emit_nal(uint8_t* out, long cap, long off, int ref_idc, int type,
                     const uint8_t* rbsp, long n) {
    if (off + 5 > cap) return -1;
    out[off++] = 0; out[off++] = 0; out[off++] = 0; out[off++] = 1;
    out[off++] = uint8_t((ref_idc << 5) | type);
    int zeros = 0;
    for (long i = 0; i < n; ++i) {
        if (zeros >= 2 && rbsp[i] <= 3) {
            if (off >= cap) return -1;
            out[off++] = 3;  // emulation_prevention_three_byte
            zeros = 0;
        }
        if (off >= cap) return -1;
        out[off++] = rbsp[i];
        zeros = (rbsp[i] == 0) ? zeros + 1 : 0;
    }
    return off;
}

// Baseline SPS + PPS shared by both encoders (CAVLC entropy coding,
// frame_mbs_only, no cropping). Returns new offset or -1.
inline long emit_sps_pps(uint8_t* out, long out_cap, long off,
                         uint8_t* scratch, long scratch_cap,
                         int mbs_x, int mbs_y) {
    {
        BitWriter w{scratch, scratch_cap};
        w.put_bits(66, 8);   // profile_idc: baseline
        w.put_bits(0xC0, 8); // constraint_set0+1
        w.put_bits(40, 8);   // level 4.0
        w.put_ue(0);         // seq_parameter_set_id
        w.put_ue(0);         // log2_max_frame_num_minus4
        w.put_ue(2);         // pic_order_cnt_type: derived from frame_num
        w.put_ue(1);         // max_num_ref_frames: the P tier references
                             // the previous frame (sliding window of 1);
                             // harmless for the all-intra tiers
        w.put_bit(0);        // gaps_in_frame_num_value_allowed
        w.put_ue(uint32_t(mbs_x - 1));
        w.put_ue(uint32_t(mbs_y - 1));
        w.put_bit(1);        // frame_mbs_only
        w.put_bit(1);        // direct_8x8_inference
        w.put_bit(0);        // frame_cropping
        w.put_bit(0);        // vui_parameters_present
        w.rbsp_trailing();
        off = emit_nal(out, out_cap, off, 3, 7, scratch, w.pos);
        if (off < 0) return -1;
    }
    {
        BitWriter w{scratch, scratch_cap};
        w.put_ue(0);         // pic_parameter_set_id
        w.put_ue(0);         // seq_parameter_set_id
        w.put_bit(0);        // entropy_coding_mode: CAVLC
        w.put_bit(0);        // bottom_field_pic_order_in_frame_present
        w.put_ue(0);         // num_slice_groups_minus1
        w.put_ue(0);         // num_ref_idx_l0_default_active_minus1
        w.put_ue(0);         // num_ref_idx_l1_default_active_minus1
        w.put_bit(0);        // weighted_pred
        w.put_bits(0, 2);    // weighted_bipred_idc
        w.put_se(0);         // pic_init_qp_minus26
        w.put_se(0);         // pic_init_qs_minus26
        w.put_se(0);         // chroma_qp_index_offset
        w.put_bit(1);        // deblocking_filter_control_present: slices
                             // disable the loop filter so decoder output
                             // is bit-exactly the encoder reconstruction
        w.put_bit(0);        // constrained_intra_pred
        w.put_bit(0);        // redundant_pic_cnt_present
        w.rbsp_trailing();
        off = emit_nal(out, out_cap, off, 3, 8, scratch, w.pos);
        if (off < 0) return -1;
    }
    return off;
}

}  // namespace vptpu

#endif  // VPTPU_H264_COMMON_H
