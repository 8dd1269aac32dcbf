/* asp_ref.c — literal C oracle for audiosignalprocess_tpu.
 *
 * A single-threaded C implementation of the framework's DSP chain with the
 * EXACT structural conventions pinned by cpu_ref/oracle.py (that module's
 * docstring is the spec).  The reference repo is a C DSP codebase of this
 * shape (BASELINE.json:5); its mount was empty at survey time
 * (SURVEY.md §0), so this file *is* the "reference C implementation" the
 * JAX/Pallas paths are held to: bit-for-bit structure (lengths, framing,
 * ordering, scaling) and >= 60 dB SNR numerics.
 *
 * Written from scratch against the pinned conventions — no code from any
 * external repo.  Build: cc -O2 -shared -fPIC -lm -o libasp_ref.so asp_ref.c
 */

#include <math.h>
#include <stdlib.h>
#include <string.h>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

/* ------------------------------------------------------------------ */
/* windows: periodic (DFT-even) for STFT, symmetric for FIR design     */
/* kind: 0=rect 1=hann 2=hamming 3=blackman                            */
/* ------------------------------------------------------------------ */

void asp_window(int kind, int n, int periodic, double *w) {
    if (n <= 0) return;
    if (n == 1 && !periodic) { w[0] = 1.0; return; }  /* scipy: sym window of 1 is [1.0] */
    double denom = periodic ? (double)n : (double)(n - 1);
    for (int i = 0; i < n; i++) {
        double t = (double)i;
        switch (kind) {
        case 1: w[i] = 0.5 - 0.5 * cos(2.0 * M_PI * t / denom); break;
        case 2: w[i] = 0.54 - 0.46 * cos(2.0 * M_PI * t / denom); break;
        case 3:
            w[i] = 0.42 - 0.5 * cos(2.0 * M_PI * t / denom)
                 + 0.08 * cos(4.0 * M_PI * t / denom);
            break;
        default: w[i] = 1.0;
        }
    }
}

/* ------------------------------------------------------------------ */
/* radix-2 DIT FFT, in-place, explicit bit reversal + twiddle tables   */
/* re/im length n (power of two); sign=-1 forward, +1 inverse core     */
/* ------------------------------------------------------------------ */

void asp_fft_radix2(double *re, double *im, int n, int sign) {
    /* bit-reversal permutation */
    for (int i = 1, j = 0; i < n; i++) {
        int bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) {
            double tr = re[i]; re[i] = re[j]; re[j] = tr;
            double ti = im[i]; im[i] = im[j]; im[j] = ti;
        }
    }
    /* butterfly stages: half-size m, group size 2m */
    for (int m = 1; m < n; m <<= 1) {
        double ang = (double)sign * M_PI / (double)m;
        double wr0 = cos(ang), wi0 = sin(ang);
        for (int g = 0; g < n; g += 2 * m) {
            double wr = 1.0, wi = 0.0;
            for (int k = 0; k < m; k++) {
                int a = g + k, b = g + k + m;
                double br = re[b] * wr - im[b] * wi;
                double bi = re[b] * wi + im[b] * wr;
                re[b] = re[a] - br; im[b] = im[a] - bi;
                re[a] += br;        im[a] += bi;
                double nwr = wr * wr0 - wi * wi0;
                wi = wr * wi0 + wi * wr0;
                wr = nwr;
            }
        }
    }
}

void asp_ifft_radix2(double *re, double *im, int n) {
    asp_fft_radix2(re, im, n, +1);
    double s = 1.0 / (double)n;
    for (int i = 0; i < n; i++) { re[i] *= s; im[i] *= s; }
}

/* split-radix FFT (L-shaped butterflies), recursive, out-of-place.
 * stride-based recursion on the input; output in natural order.
 * Oracle code — clarity over allocation thrift. */
static void sr_fft(const double *xr, const double *xi, int stride, int n,
                   double *yr, double *yi, int sign) {
    if (n == 1) { yr[0] = xr[0]; yi[0] = xi[0]; return; }
    if (n == 2) {
        yr[0] = xr[0] + xr[stride]; yi[0] = xi[0] + xi[stride];
        yr[1] = xr[0] - xr[stride]; yi[1] = xi[0] - xi[stride];
        return;
    }
    int h = n / 2, q = n / 4;
    double *ur = (double *)malloc(sizeof(double) * (size_t)h);
    double *ui = (double *)malloc(sizeof(double) * (size_t)h);
    double *zr = (double *)malloc(sizeof(double) * (size_t)q);
    double *zi = (double *)malloc(sizeof(double) * (size_t)q);
    double *pr = (double *)malloc(sizeof(double) * (size_t)q);
    double *pi = (double *)malloc(sizeof(double) * (size_t)q);
    sr_fft(xr, xi, stride * 2, h, ur, ui, sign);               /* x[2k]   */
    sr_fft(xr + stride, xi + stride, stride * 4, q, zr, zi, sign);     /* x[4k+1] */
    sr_fft(xr + 3 * stride, xi + 3 * stride, stride * 4, q, pr, pi, sign); /* x[4k+3] */
    for (int k = 0; k < q; k++) {
        double a1 = (double)sign * 2.0 * M_PI * (double)k / (double)n;
        double a3 = 3.0 * a1;
        double w1r = cos(a1), w1i = sin(a1);
        double w3r = cos(a3), w3i = sin(a3);
        double zwr = zr[k] * w1r - zi[k] * w1i;
        double zwi = zr[k] * w1i + zi[k] * w1r;
        double pwr = pr[k] * w3r - pi[k] * w3i;
        double pwi = pr[k] * w3i + pi[k] * w3r;
        double sr_ = zwr + pwr, si_ = zwi + pwi;
        /* d = -i*sign? forward (sign=-1): d = -i (zw - pw) */
        double dr, di;
        if (sign < 0) { dr =  (zwi - pwi); di = -(zwr - pwr); }
        else          { dr = -(zwi - pwi); di =  (zwr - pwr); }
        yr[k]         = ur[k] + sr_;      yi[k]         = ui[k] + si_;
        yr[k + q]     = ur[k + q] + dr;   yi[k + q]     = ui[k + q] + di;
        yr[k + h]     = ur[k] - sr_;      yi[k + h]     = ui[k] - si_;
        yr[k + h + q] = ur[k + q] - dr;   yi[k + h + q] = ui[k + q] - di;
    }
    free(ur); free(ui); free(zr); free(zi); free(pr); free(pi);
}

void asp_fft_splitradix(const double *xr, const double *xi, int n,
                        double *yr, double *yi) {
    sr_fft(xr, xi, 1, n, yr, yi, -1);
}

/* real FFT via n/2 complex FFT + untangle; out: n/2+1 bins (re, im)    */
void asp_rfft(const double *x, int n, double *sr, double *si) {
    int h = n / 2;
    double *zr = (double *)malloc(sizeof(double) * (size_t)h);
    double *zi = (double *)malloc(sizeof(double) * (size_t)h);
    for (int i = 0; i < h; i++) { zr[i] = x[2 * i]; zi[i] = x[2 * i + 1]; }
    asp_fft_radix2(zr, zi, h, -1);
    for (int k = 0; k <= h; k++) {
        int k1 = k % h, k2 = (h - k) % h;
        double ar = zr[k1], ai = zi[k1];
        double br = zr[k2], bi = -zi[k2];
        double xer = 0.5 * (ar + br), xei = 0.5 * (ai + bi);
        double xor_ = 0.5 * (ai - bi), xoi = -0.5 * (ar - br);
        double ang = -2.0 * M_PI * (double)k / (double)n;
        double wr = cos(ang), wi = sin(ang);
        sr[k] = xer + wr * xor_ - wi * xoi;
        si[k] = xei + wr * xoi + wi * xor_;
    }
    free(zr); free(zi);
}

/* inverse real FFT: n samples from n/2+1 bins, 1/N scaling             */
void asp_irfft(const double *sr, const double *si, int n, double *x) {
    int h = n / 2;
    double *zr = (double *)malloc(sizeof(double) * (size_t)h);
    double *zi = (double *)malloc(sizeof(double) * (size_t)h);
    for (int k = 0; k < h; k++) {
        double ar = sr[k], ai = si[k];
        double br = sr[h - k], bi = -si[h - k];
        double xer = 0.5 * (ar + br), xei = 0.5 * (ai + bi);
        double ang = 2.0 * M_PI * (double)k / (double)n;
        double wr = cos(ang), wi = sin(ang);
        double dr = 0.5 * (ar - br), di = 0.5 * (ai - bi);
        double xor_ = dr * wr - di * wi, xoi = dr * wi + di * wr;
        zr[k] = xer - xoi;      /* Re(xe + i*xo) with xo = xor_+i*xoi */
        zi[k] = xei + xor_;
    }
    asp_ifft_radix2(zr, zi, h);
    for (int i = 0; i < h; i++) { x[2 * i] = zr[i]; x[2 * i + 1] = zi[i]; }
    free(zr); free(zi);
}

/* ------------------------------------------------------------------ */
/* windowed-sinc FIR design (firwin-compatible, odd/even taps)         */
/* cutoff: nc edges in (0,1) Nyquist units; pass_zero: 1 lowpass/stop  */
/* ------------------------------------------------------------------ */

/* returns 0 on success, -1 for an invalid (unnormalizable) design —
 * e.g. even numtaps with Nyquist-band gain (type-II highpass) */
int asp_design_fir(int numtaps, const double *cutoff, int nc, int kind,
                   int pass_zero, double *h) {
    double *bands = (double *)malloc(sizeof(double) * (size_t)(nc + 2));
    bands[0] = 0.0;
    for (int i = 0; i < nc; i++) bands[i + 1] = cutoff[i];
    bands[nc + 1] = 1.0;
    double center = 0.5 * (double)(numtaps - 1);
    memset(h, 0, sizeof(double) * (size_t)numtaps);
    int passband = pass_zero;
    double scale_freq = -1.0;
    for (int bi = 0; bi < nc + 1; bi++) {
        double lo = bands[bi], hi = bands[bi + 1];
        if (passband) {
            for (int i = 0; i < numtaps; i++) {
                double m = (double)i - center;
                double shi = (m == 0.0) ? hi : hi * sin(M_PI * hi * m) / (M_PI * hi * m);
                double slo = (lo == 0.0) ? lo
                           : ((m == 0.0) ? lo : lo * sin(M_PI * lo * m) / (M_PI * lo * m));
                h[i] += shi - slo;
            }
            if (scale_freq < 0.0)
                scale_freq = (lo == 0.0) ? 0.0 : ((hi == 1.0) ? 1.0 : 0.5 * (lo + hi));
        }
        passband = !passband;
    }
    double *w = (double *)malloc(sizeof(double) * (size_t)numtaps);
    asp_window(kind, numtaps, 0, w);
    double s = 0.0;
    double hmax = 0.0;
    for (int i = 0; i < numtaps; i++) {
        h[i] *= w[i];
        double m = (double)i - center;
        s += h[i] * cos(M_PI * m * scale_freq);
        if (fabs(h[i]) > hmax) hmax = fabs(h[i]);
    }
    free(w); free(bands);
    if (fabs(s) < 1e-8 * (hmax > 0.0 ? hmax : 1.0) * numtaps)
        return -1;  /* normalization frequency has ~zero gain */
    for (int i = 0; i < numtaps; i++) h[i] /= s;
    return 0;
}

/* causal direct-form FIR: y[i] = sum_t h[t] x[i-t], len(y)==len(x)     */
void asp_fir_direct(const double *x, int n, const double *h, int t, double *y) {
    for (int i = 0; i < n; i++) {
        double acc = 0.0;
        int kmax = (i < t - 1) ? i : t - 1;
        for (int k = 0; k <= kmax; k++) acc += h[k] * x[i - k];
        y[i] = acc;
    }
}

/* overlap-save block convolution == fir_direct (B = nfft - (t-1))      */
void asp_overlap_save(const double *x, int n, const double *h, int t,
                      int nfft, double *y) {
    int b = nfft - (t - 1);
    int nblocks = (n + b - 1) / b;
    int half = nfft / 2;
    double *hf_r = (double *)malloc(sizeof(double) * (size_t)(half + 1));
    double *hf_i = (double *)malloc(sizeof(double) * (size_t)(half + 1));
    double *hp = (double *)calloc((size_t)nfft, sizeof(double));
    memcpy(hp, h, sizeof(double) * (size_t)t);
    asp_rfft(hp, nfft, hf_r, hf_i);
    double *seg = (double *)malloc(sizeof(double) * (size_t)nfft);
    double *sr = (double *)malloc(sizeof(double) * (size_t)(half + 1));
    double *si = (double *)malloc(sizeof(double) * (size_t)(half + 1));
    double *out = (double *)malloc(sizeof(double) * (size_t)nfft);
    for (int blk = 0; blk < nblocks; blk++) {
        int start = blk * b - (t - 1); /* x index of seg[0] */
        for (int i = 0; i < nfft; i++) {
            int xi = start + i;
            seg[i] = (xi >= 0 && xi < n) ? x[xi] : 0.0;
        }
        asp_rfft(seg, nfft, sr, si);
        for (int k = 0; k <= half; k++) {
            double rr = sr[k] * hf_r[k] - si[k] * hf_i[k];
            double ii = sr[k] * hf_i[k] + si[k] * hf_r[k];
            sr[k] = rr; si[k] = ii;
        }
        asp_irfft(sr, si, nfft, out);
        for (int i = 0; i < b; i++) {
            int yi = blk * b + i;
            if (yi < n) y[yi] = out[t - 1 + i];
        }
    }
    free(hf_r); free(hf_i); free(hp); free(seg); free(sr); free(si); free(out);
}

/* polyphase rational resampler, oracle convention:
 * y[j] = sum_k h[p_j + up*k] x[m_j - k], j*down + delay = m_j*up + p_j  */
void asp_resample_poly(const double *x, int n, int up, int down,
                       const double *h, int t, int zero_phase, double *y,
                       int nout) {
    int delay = zero_phase ? (t - 1) / 2 : 0;
    int nk = (t + up - 1) / up;
    for (int j = 0; j < nout; j++) {
        long pos = (long)j * down + delay;
        long m = pos / up;
        int p = (int)(pos - m * up);
        double acc = 0.0;
        for (int k = 0; k < nk; k++) {
            int tap = p + up * k;
            long xi = m - k;
            if (tap < t && xi >= 0 && xi < n) acc += h[tap] * x[xi];
        }
        y[j] = acc;
    }
}

/* STFT: frames at k*hop, no padding; spec layout (frames, half+1) r/i  */
void asp_stft(const double *x, int n, int nfft, int hop, int kind,
              double *spec_r, double *spec_i) {
    int nframes = 1 + (n - nfft) / hop;
    int half = nfft / 2;
    double *w = (double *)malloc(sizeof(double) * (size_t)nfft);
    asp_window(kind, nfft, 1, w);
    double *fr = (double *)malloc(sizeof(double) * (size_t)nfft);
    for (int f = 0; f < nframes; f++) {
        for (int i = 0; i < nfft; i++) fr[i] = x[f * hop + i] * w[i];
        asp_rfft(fr, nfft, spec_r + (size_t)f * (half + 1),
                 spec_i + (size_t)f * (half + 1));
    }
    free(w); free(fr);
}

/* WOLA ISTFT; out length nfft + (nframes-1)*hop                        */
void asp_istft(const double *spec_r, const double *spec_i, int nframes,
               int nfft, int hop, int kind, double *y) {
    int half = nfft / 2;
    int nout = nfft + (nframes - 1) * hop;
    double *w = (double *)malloc(sizeof(double) * (size_t)nfft);
    asp_window(kind, nfft, 1, w);
    double *norm = (double *)calloc((size_t)nout, sizeof(double));
    double *fr = (double *)malloc(sizeof(double) * (size_t)nfft);
    memset(y, 0, sizeof(double) * (size_t)nout);
    for (int f = 0; f < nframes; f++) {
        asp_irfft(spec_r + (size_t)f * (half + 1),
                  spec_i + (size_t)f * (half + 1), nfft, fr);
        for (int i = 0; i < nfft; i++) {
            y[f * hop + i] += fr[i] * w[i];
            norm[f * hop + i] += w[i] * w[i];
        }
    }
    /* clamp the WOLA norm at WOLA_EDGE_REL (1e-3) of its peak: edge
       samples with <0.1% window coverage taper instead of amplifying
       modified-spectrum residue by 1/w^2 (see cpu_ref/oracle.py spec) */
    double nmax = 0.0;
    for (int i = 0; i < nout; i++)
        if (norm[i] > nmax) nmax = norm[i];
    double clamp = 1e-3 * nmax;
    if (clamp < 1e-12) clamp = 1e-12;
    for (int i = 0; i < nout; i++)
        y[i] /= (norm[i] > clamp ? norm[i] : clamp);
    free(w); free(norm); free(fr);
}

/* envelope: |x| -> causal FIR lowpass -> * pi/2                        */
void asp_envelope(const double *x, int n, const double *h, int t, double *y) {
    double *r = (double *)malloc(sizeof(double) * (size_t)n);
    for (int i = 0; i < n; i++) r[i] = fabs(x[i]);
    asp_fir_direct(r, n, h, t, y);
    for (int i = 0; i < n; i++) y[i] *= M_PI / 2.0;
    free(r);
}

/* spectral noise gate, conventions per oracle.noise_gate               */
void asp_noise_gate(const double *x, int n, int nfft, int hop,
                    double threshold_db, double reduction_db,
                    int noise_frames, int kind, double *y, int *nout) {
    /* invalid geometry signals *nout = -1 (mirrors the Python oracle's
     * ValueError): n < nfft gives nframes <= 0 (a negative malloc size
     * cast to size_t), noise_frames <= 0 divides the floor by zero */
    if (n < nfft || hop <= 0 || noise_frames <= 0) { *nout = -1; return; }
    int nframes = 1 + (n - nfft) / hop;
    int half = nfft / 2;
    size_t bins = (size_t)(half + 1);
    if (noise_frames > nframes) noise_frames = nframes;  /* clamp: no OOB */
    double *sr = (double *)malloc(sizeof(double) * (size_t)nframes * bins);
    double *si = (double *)malloc(sizeof(double) * (size_t)nframes * bins);
    if (!sr || !si) { free(sr); free(si); *nout = -1; return; }
    asp_stft(x, n, nfft, hop, kind, sr, si);
    double *floor_ = (double *)calloc(bins, sizeof(double));
    if (!floor_) { free(sr); free(si); *nout = -1; return; }
    for (int f = 0; f < noise_frames; f++)
        for (size_t k = 0; k < bins; k++) {
            double re = sr[(size_t)f * bins + k], im = si[(size_t)f * bins + k];
            floor_[k] += sqrt(re * re + im * im);
        }
    for (size_t k = 0; k < bins; k++) floor_[k] /= (double)noise_frames;
    double gate_up = pow(10.0, threshold_db / 20.0);
    double att = pow(10.0, -reduction_db / 20.0);
    for (int f = 0; f < nframes; f++)
        for (size_t k = 0; k < bins; k++) {
            size_t i = (size_t)f * bins + k;
            double mag = sqrt(sr[i] * sr[i] + si[i] * si[i]);
            double m = (mag > floor_[k] * gate_up) ? 1.0 : att;
            sr[i] *= m; si[i] *= m;
        }
    asp_istft(sr, si, nframes, nfft, hop, kind, y);
    *nout = nfft + (nframes - 1) * hop;
    free(sr); free(si); free(floor_);
}
