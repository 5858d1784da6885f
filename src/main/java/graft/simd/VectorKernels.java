package graft.simd;

import jdk.incubator.vector.ByteVector;
import jdk.incubator.vector.IntVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD row kernels for the pure-JVM H.264 decoder's interior
 * motion-compensation paths (JDK 17 incubator Vector API, VERDICT r13
 * ask 4). Every kernel processes one 16-sample luma row — a single
 * 512-bit int vector on AVX-512, two 256-bit ops elsewhere; the species
 * is chosen at class load and the arithmetic is bit-identical to the
 * scalar loops in H264Codec (same integer FIR, same rounding, same
 * clamps), which the SIMD/scalar parity spec pins.
 *
 * The class touches jdk.incubator.vector only from method bodies, so a
 * JVM without {@code --add-modules jdk.incubator.vector} fails the
 * {@code probe()} call with NoClassDefFoundError and the Scala seam
 * (graft.sources.Simd) falls back to the scalar paths.
 */
public final class VectorKernels {
    private VectorKernels() {}

    // 256-bit species even where AVX-512 exists: 512-bit ("heavy")
    // instructions trigger license-based frequency downclocking on this
    // host's CPU generation, slowing the SCALAR majority of the decoder
    // — measured as a consistent 0.89-0.96x SimdAb ratio on
    // low-vector-share (VGA/skip-heavy) content that flipped positive
    // with 256-bit vectors. 16-wide rows run as two 8-lane halves.
    private static final VectorSpecies<Integer> I16 = IntVector.SPECIES_256;
    private static final VectorSpecies<Byte> B16 = ByteVector.SPECIES_64;
    private static final IntVector V20 = IntVector.broadcast(I16, 20);
    private static final IntVector V5 = IntVector.broadcast(I16, 5);
    private static final IntVector V255 = IntVector.broadcast(I16, 255);
    private static final IntVector V0 = IntVector.zero(I16);

    /** forces the vector classes to load + JIT-probe; returns true when
     *  the preferred species is wide enough to be worth the seam */
    public static boolean probe() {
        int[] tmp = new int[16];
        byte[] src = new byte[32];
        for (int i = 0; i < 32; i++) src[i] = (byte) (i * 7 + 3);
        widenRow16(src, 2, tmp, 0);
        for (int i = 0; i < 16; i++)
            if (tmp[i] != ((i + 2) * 7 + 3 & 0xff)) return false;
        return IntVector.SPECIES_PREFERRED.length() >= 8;
    }

    private static IntVector loadW(byte[] plane, int p) {
        // signed B2I + mask: this JDK build's ZERO_EXTEND_B2I shape
        // conversion throws in resizeLanes0 (value 2^40-1 ... ETYPE int)
        return ((IntVector) ByteVector.fromArray(B16, plane, p)
            .convertShape(VectorOperators.B2I, I16, 0)).and(0xff);
    }

    /** full-pel interior row: out[o..o+15] = plane[p..p+15] & 0xff */
    public static void widenRow16(byte[] plane, int p, int[] out, int o) {
        loadW(plane, p).intoArray(out, o);
        loadW(plane, p + 8).intoArray(out, o + 8);
    }

    /** horizontal 6-tap half-pel row (position b):
     *  out = clip(((a+f) + 20(c+d) - 5(b+e) + 16) >> 5) */
    public static void hfirRow16(byte[] plane, int p, int[] out, int o) {
        hfir8(plane, p, out, o);
        hfir8(plane, p + 8, out, o + 8);
    }

    private static void hfir8(byte[] plane, int p, int[] out, int o) {
        IntVector s = loadW(plane, p - 2).add(loadW(plane, p + 3))
            .add(loadW(plane, p).add(loadW(plane, p + 1)).mul(V20))
            .sub(loadW(plane, p - 1).add(loadW(plane, p + 2)).mul(V5))
            .add(16).lanewise(VectorOperators.ASHR, 5);
        s.max(V0).min(V255).intoArray(out, o);
    }

    /** vertical 6-tap half-pel row (position h), row stride pw */
    public static void vfirRow16(byte[] plane, int p, int pw, int[] out, int o) {
        vfir8(plane, p, pw, out, o);
        vfir8(plane, p + 8, pw, out, o + 8);
    }

    private static void vfir8(byte[] plane, int p, int pw, int[] out, int o) {
        IntVector s = loadW(plane, p - 2 * pw).add(loadW(plane, p + 3 * pw))
            .add(loadW(plane, p).add(loadW(plane, p + pw)).mul(V20))
            .sub(loadW(plane, p - pw).add(loadW(plane, p + 2 * pw)).mul(V5))
            .add(16).lanewise(VectorOperators.ASHR, 5);
        s.max(V0).min(V255).intoArray(out, o);
    }

    /** horizontal 6-tap WITHOUT normalisation (the j position's first
     *  separable pass into the hrow buffer) */
    public static void hrawRow16(byte[] plane, int p, int[] hb, int o) {
        hraw8(plane, p, hb, o);
        hraw8(plane, p + 8, hb, o + 8);
    }

    private static void hraw8(byte[] plane, int p, int[] hb, int o) {
        loadW(plane, p - 2).add(loadW(plane, p + 3))
            .add(loadW(plane, p).add(loadW(plane, p + 1)).mul(V20))
            .sub(loadW(plane, p - 1).add(loadW(plane, p + 2)).mul(V5))
            .intoArray(hb, o);
    }

    /** vertical 6-tap over the int hrow buffer + 10-bit normalisation
     *  (the j position's second pass); hb rows are stride 16 at i */
    public static void jfirRow16(int[] hb, int i, int[] out, int o) {
        jfir8(hb, i, out, o);
        jfir8(hb, i + 8, out, o + 8);
    }

    private static void jfir8(int[] hb, int i, int[] out, int o) {
        IntVector s = IntVector.fromArray(I16, hb, i)
            .add(IntVector.fromArray(I16, hb, i + 80))
            .add(IntVector.fromArray(I16, hb, i + 32)
                .add(IntVector.fromArray(I16, hb, i + 48)).mul(V20))
            .sub(IntVector.fromArray(I16, hb, i + 16)
                .add(IntVector.fromArray(I16, hb, i + 64)).mul(V5))
            .add(512).lanewise(VectorOperators.ASHR, 10);
        s.max(V0).min(V255).intoArray(out, o);
    }

    /** prediction-is-reconstruction store: recon[rb..rb+15] =
     *  (byte) pred[pb..pb+15] (values already clipped to 0..255) */
    public static void narrowRow16(int[] pred, int pb, byte[] recon, int rb) {
        ((ByteVector) IntVector.fromArray(I16, pred, pb)
            .convertShape(VectorOperators.I2B, B16, 0))
            .intoArray(recon, rb);
        ((ByteVector) IntVector.fromArray(I16, pred, pb + 8)
            .convertShape(VectorOperators.I2B, B16, 0))
            .intoArray(recon, rb + 8);
    }

    /** rounding average of two 16-int rows into the first:
     *  a[o..] = (a[o..] + b[p..] + 1) >> 1 (bi prediction / quarter-pel) */
    public static void avgRow16(int[] a, int o, int[] b, int p) {
        IntVector.fromArray(I16, a, o).add(IntVector.fromArray(I16, b, p))
            .add(1).lanewise(VectorOperators.ASHR, 1).intoArray(a, o);
        IntVector.fromArray(I16, a, o + 8).add(IntVector.fromArray(I16, b, p + 8))
            .add(1).lanewise(VectorOperators.ASHR, 1).intoArray(a, o + 8);
    }

    /** three-address rounding average: out[oo..] = (a[ao..]+b[bo..]+1)>>1 */
    public static void avg3Row16(int[] a, int ao, int[] b, int bo,
            int[] out, int oo) {
        IntVector.fromArray(I16, a, ao).add(IntVector.fromArray(I16, b, bo))
            .add(1).lanewise(VectorOperators.ASHR, 1).intoArray(out, oo);
        IntVector.fromArray(I16, a, ao + 8).add(IntVector.fromArray(I16, b, bo + 8))
            .add(1).lanewise(VectorOperators.ASHR, 1).intoArray(out, oo + 8);
    }

    private static final VectorSpecies<Integer> I8 = IntVector.SPECIES_256;
    private static final VectorSpecies<Byte> B8 = ByteVector.SPECIES_64;
    private static final IntVector V255_8 = IntVector.broadcast(I8, 255);
    private static final IntVector V0_8 = IntVector.zero(I8);

    /** 8-wide narrow store (chroma rows) */
    public static void narrowRow8(int[] pred, int pb, byte[] recon, int rb) {
        ((ByteVector) IntVector.fromArray(I8, pred, pb)
            .convertShape(VectorOperators.I2B, B8, 0))
            .intoArray(recon, rb);
    }

    /** residual commit, luma row: recon = clip(pred + res) narrowed */
    public static void addClipNarrowRow16(int[] pred, int pb, int[] res,
            int sb, byte[] recon, int rb) {
        IntVector v = IntVector.fromArray(I16, pred, pb)
            .add(IntVector.fromArray(I16, res, sb)).max(V0).min(V255);
        ((ByteVector) v.convertShape(VectorOperators.I2B, B16, 0))
            .intoArray(recon, rb);
        IntVector v2 = IntVector.fromArray(I16, pred, pb + 8)
            .add(IntVector.fromArray(I16, res, sb + 8)).max(V0).min(V255);
        ((ByteVector) v2.convertShape(VectorOperators.I2B, B16, 0))
            .intoArray(recon, rb + 8);
    }

    /** residual commit, chroma row */
    public static void addClipNarrowRow8(int[] pred, int pb, int[] res,
            int sb, byte[] recon, int rb) {
        IntVector v = IntVector.fromArray(I8, pred, pb)
            .add(IntVector.fromArray(I8, res, sb)).max(V0_8).min(V255_8);
        ((ByteVector) v.convertShape(VectorOperators.I2B, B8, 0))
            .intoArray(recon, rb);
    }

    /** 8-wide full-pel widen (chroma interior copy rows) */
    public static void widenRow8(byte[] plane, int p, int[] out, int o) {
        loadW8(plane, p).intoArray(out, o);
    }

    private static IntVector loadW8(byte[] plane, int p) {
        return ((IntVector) ByteVector.fromArray(B8, plane, p)
            .convertShape(VectorOperators.B2I, I8, 0)).and(0xff);
    }

    /** chroma bilinear horizontal pass (§8.4.2.2.2), one 8-sample row:
     *  h[o..] = 8*a + fx*(b - a); fx 0 degenerates to 8*a (the extra
     *  b load stays in bounds — the interior guard spans x..x+8) */
    public static void chromaHRow8(byte[] plane, int p, int fx, int[] h, int o) {
        IntVector a = loadW8(plane, p);
        IntVector b = loadW8(plane, p + 1);
        a.lanewise(VectorOperators.LSHL, 3)
            .add(b.sub(a).mul(fx)).intoArray(h, o);
    }

    /** chroma bilinear vertical pass: out = (8*h0 + fy*(h1-h0) + 32) >> 6 */
    public static void chromaVRow8(int[] h0, int o0, int[] h1, int o1,
            int fy, int[] out, int oo) {
        IntVector a = IntVector.fromArray(I8, h0, o0);
        IntVector b = IntVector.fromArray(I8, h1, o1);
        a.lanewise(VectorOperators.LSHL, 3)
            .add(b.sub(a).mul(fy)).add(32)
            .lanewise(VectorOperators.ASHR, 6).intoArray(out, oo);
    }

    // ------------------------------------------------------------------
    // Batched 4x4 inverse transform (round 15): the residual butterflies
    // were the largest still-scalar slice of 720p decode (~20%,
    // BENCHNOTES r14). Layout is SoA across EIGHT 4x4 blocks — one lane
    // per block, soa[p*8 + b] = raster position p of block b — so the
    // §8.5.12.2 butterflies and the dequant multiply become straight
    // 8-lane arithmetic with no shuffles at all. Bit-identical to the
    // scalar dequantAc + inverse4x4 pair (same shifts, same rounding).
    // ------------------------------------------------------------------

    /** SoA dequant: soa[p*8+b] = (level * vArr[p]) << shift for raster
     *  positions p in [fromPos, 16) — vArr is the position's V(qp%6)
     *  scale row, shift = qp/6. fromPos 1 leaves the DC lane row for a
     *  separately-scaled DC (chroma). */
    public static void dequantRows8(int[] soa, int[] vArr, int shift, int fromPos) {
        for (int p = fromPos; p < 16; p++) {
            IntVector.fromArray(I8, soa, p * 8)
                .mul(vArr[p]).lanewise(VectorOperators.LSHL, shift)
                .intoArray(soa, p * 8);
        }
    }

    /** in-place inverse 4x4 of eight blocks at once (SoA): row pass,
     *  column pass, final (x + 32) >> 6 — one lane per block */
    public static void inverse4x4x8(int[] soa) {
        for (int r = 0; r < 4; r++) { // row butterflies: positions 4r..4r+3
            int o = r * 32;
            IntVector x0 = IntVector.fromArray(I8, soa, o);
            IntVector x1 = IntVector.fromArray(I8, soa, o + 8);
            IntVector x2 = IntVector.fromArray(I8, soa, o + 16);
            IntVector x3 = IntVector.fromArray(I8, soa, o + 24);
            IntVector e0 = x0.add(x2);
            IntVector e1 = x0.sub(x2);
            IntVector e2 = x1.lanewise(VectorOperators.ASHR, 1).sub(x3);
            IntVector e3 = x1.add(x3.lanewise(VectorOperators.ASHR, 1));
            e0.add(e3).intoArray(soa, o);
            e1.add(e2).intoArray(soa, o + 8);
            e1.sub(e2).intoArray(soa, o + 16);
            e0.sub(e3).intoArray(soa, o + 24);
        }
        for (int c = 0; c < 4; c++) { // column butterflies + rounding
            int o = c * 8;
            IntVector x0 = IntVector.fromArray(I8, soa, o);
            IntVector x1 = IntVector.fromArray(I8, soa, o + 32);
            IntVector x2 = IntVector.fromArray(I8, soa, o + 64);
            IntVector x3 = IntVector.fromArray(I8, soa, o + 96);
            IntVector e0 = x0.add(x2);
            IntVector e1 = x0.sub(x2);
            IntVector e2 = x1.lanewise(VectorOperators.ASHR, 1).sub(x3);
            IntVector e3 = x1.add(x3.lanewise(VectorOperators.ASHR, 1));
            e0.add(e3).add(32).lanewise(VectorOperators.ASHR, 6).intoArray(soa, o);
            e1.add(e2).add(32).lanewise(VectorOperators.ASHR, 6).intoArray(soa, o + 32);
            e1.sub(e2).add(32).lanewise(VectorOperators.ASHR, 6).intoArray(soa, o + 64);
            e0.sub(e3).add(32).lanewise(VectorOperators.ASHR, 6).intoArray(soa, o + 96);
        }
    }

    /** running-bound SAD of a 16-wide byte block pair, bound-checked
     *  every 4 rows. Partial sums are only ever compared against the
     *  caller's incumbent with >=, so the coarser abort granularity is
     *  DECISION-identical to the scalar per-row exit: any sum at or
     *  above the bound rejects, and accepted candidates always ran to
     *  the exact full sum (integer adds are associative). */
    public static long sadByte16(byte[] src, int so, int ss,
            byte[] ref, int ro, int rs, int h, long bound) {
        long total = 0;
        for (int r0 = 0; r0 < h; r0 += 4) {
            IntVector acc = V0;
            int rEnd = Math.min(r0 + 4, h);
            for (int r = r0; r < rEnd; r++) {
                int a = so + r * ss, b = ro + r * rs;
                acc = acc.add(loadW(src, a).sub(loadW(ref, b)).abs());
                acc = acc.add(loadW(src, a + 8).sub(loadW(ref, b + 8)).abs());
            }
            total += acc.reduceLanes(VectorOperators.ADD);
            if (total >= bound) return total;
        }
        return total;
    }

    /** 8-wide variant of {@link #sadByte16} */
    public static long sadByte8(byte[] src, int so, int ss,
            byte[] ref, int ro, int rs, int h, long bound) {
        long total = 0;
        for (int r0 = 0; r0 < h; r0 += 4) {
            IntVector acc = V0;
            int rEnd = Math.min(r0 + 4, h);
            for (int r = r0; r < rEnd; r++)
                acc = acc.add(loadW(src, so + r * ss).sub(loadW(ref, ro + r * rs)).abs());
            total += acc.reduceLanes(VectorOperators.ADD);
            if (total >= bound) return total;
        }
        return total;
    }

    /** SAD of a byte source region vs an int[] prediction buffer (the
     *  interpolated-candidate cost), 16 wide, stride ps on the pred */
    public static long sadPred16(byte[] src, int so, int ss,
            int[] pred, int po, int ps, int h, long bound) {
        long total = 0;
        for (int r0 = 0; r0 < h; r0 += 4) {
            IntVector acc = V0;
            int rEnd = Math.min(r0 + 4, h);
            for (int r = r0; r < rEnd; r++) {
                int a = so + r * ss, b = po + r * ps;
                acc = acc.add(loadW(src, a).sub(IntVector.fromArray(I16, pred, b)).abs());
                acc = acc.add(loadW(src, a + 8)
                    .sub(IntVector.fromArray(I16, pred, b + 8)).abs());
            }
            total += acc.reduceLanes(VectorOperators.ADD);
            if (total >= bound) return total;
        }
        return total;
    }

    /** 8-wide variant of {@link #sadPred16} */
    public static long sadPred8(byte[] src, int so, int ss,
            int[] pred, int po, int ps, int h, long bound) {
        long total = 0;
        for (int r0 = 0; r0 < h; r0 += 4) {
            IntVector acc = V0;
            int rEnd = Math.min(r0 + 4, h);
            for (int r = r0; r < rEnd; r++)
                acc = acc.add(loadW(src, so + r * ss)
                    .sub(IntVector.fromArray(I16, pred, po + r * ps)).abs());
            total += acc.reduceLanes(VectorOperators.ADD);
            if (total >= bound) return total;
        }
        return total;
    }
}
