/* Threaded GGUF block dequantization — the native data-loader hot path.
 *
 * Reference analog: ggml's dequantize_row_* kernels consumed by the
 * reference's ModelLoader (src/model_loader.cpp multi-threaded tensor
 * reading).  The pure-numpy fallback in sdtpu/io/gguf.py runs at a few
 * Melem/s; this extension dequantizes at memory bandwidth across threads,
 * turning multi-GB quantized checkpoint loads from minutes into seconds.
 *
 * Exposed as _sdtpu_native.dequant(type_id, src_buffer, dst_buffer, n_elems)
 * where dst is a writable f32 buffer of n_elems.  Block layouts follow the
 * GGUF spec (q4_0/q4_1/q5_0/q5_1/q8_0 and the k-quants q2_k..q6_k) plus
 * f16/bf16 conversion.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <math.h>
#include <pthread.h>
#include <stdint.h>
#include <string.h>

/* ---- fp16 -> fp32 ---- */
static inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else { /* subnormal */
            exp = 127 - 15 + 1;
            while (!(mant & 0x400)) { mant <<= 1; exp--; }
            mant &= 0x3FF;
            bits = sign | (exp << 23) | (mant << 13);
        }
    } else if (exp == 0x1F) {
        bits = sign | 0x7F800000u | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float out;
    memcpy(&out, &bits, 4);
    return out;
}

static inline uint16_t load_u16(const uint8_t* p) {
    uint16_t v;
    memcpy(&v, p, 2);
    return v;
}

/* ---- per-block kernels: src points at one block, dst at block_elems f32 ---- */

static void deq_q4_0(const uint8_t* s, float* d) {
    float dd = f16_to_f32(load_u16(s));
    const uint8_t* q = s + 2;
    for (int j = 0; j < 16; j++) {
        d[j] = ((int)(q[j] & 0xF) - 8) * dd;
        d[j + 16] = ((int)(q[j] >> 4) - 8) * dd;
    }
}

static void deq_q4_1(const uint8_t* s, float* d) {
    float dd = f16_to_f32(load_u16(s));
    float m = f16_to_f32(load_u16(s + 2));
    const uint8_t* q = s + 4;
    for (int j = 0; j < 16; j++) {
        d[j] = (q[j] & 0xF) * dd + m;
        d[j + 16] = (q[j] >> 4) * dd + m;
    }
}

static void deq_q5_0(const uint8_t* s, float* d) {
    float dd = f16_to_f32(load_u16(s));
    uint32_t qh;
    memcpy(&qh, s + 2, 4);
    const uint8_t* q = s + 6;
    for (int j = 0; j < 16; j++) {
        int x0 = (q[j] & 0xF) | (((qh >> j) & 1) << 4);
        int x1 = (q[j] >> 4) | (((qh >> (j + 16)) & 1) << 4);
        d[j] = (x0 - 16) * dd;
        d[j + 16] = (x1 - 16) * dd;
    }
}

static void deq_q5_1(const uint8_t* s, float* d) {
    float dd = f16_to_f32(load_u16(s));
    float m = f16_to_f32(load_u16(s + 2));
    uint32_t qh;
    memcpy(&qh, s + 4, 4);
    const uint8_t* q = s + 8;
    for (int j = 0; j < 16; j++) {
        int x0 = (q[j] & 0xF) | (((qh >> j) & 1) << 4);
        int x1 = (q[j] >> 4) | (((qh >> (j + 16)) & 1) << 4);
        d[j] = x0 * dd + m;
        d[j + 16] = x1 * dd + m;
    }
}

static void deq_q8_0(const uint8_t* s, float* d) {
    float dd = f16_to_f32(load_u16(s));
    const int8_t* q = (const int8_t*)(s + 2);
    for (int j = 0; j < 32; j++)
        d[j] = q[j] * dd;
}

static void deq_q2_k(const uint8_t* s, float* d) {
    const uint8_t* scales = s;
    const uint8_t* qs = s + 16;
    float dall = f16_to_f32(load_u16(s + 80));
    float dmin = f16_to_f32(load_u16(s + 82));
    int is = 0;
    for (int half = 0; half < 2; half++) {
        const uint8_t* q = qs + half * 32;
        for (int j = 0; j < 4; j++) {
            int shift = 2 * j;
            for (int sub = 0; sub < 2; sub++) {
                uint8_t sc = scales[is++];
                float dl = dall * (sc & 0xF);
                float ml = dmin * (sc >> 4);
                float* y = d + half * 128 + j * 32 + sub * 16;
                for (int l = 0; l < 16; l++)
                    y[l] = dl * ((q[sub * 16 + l] >> shift) & 3) - ml;
            }
        }
    }
}

static void deq_q3_k(const uint8_t* s, float* d) {
    const uint8_t* hmask = s;
    const uint8_t* qs = s + 32;
    const uint8_t* rs = s + 96;
    float dall = f16_to_f32(load_u16(s + 108));
    int8_t scales[16];
    /* kmask unpack: 16 6-bit scales from 12 bytes */
    for (int j = 0; j < 4; j++) {
        scales[j]      = (int8_t)(((rs[j]     & 0xF) | (((rs[8 + j] >> 0) & 3) << 4)) - 32);
        scales[j + 4]  = (int8_t)(((rs[4 + j] & 0xF) | (((rs[8 + j] >> 2) & 3) << 4)) - 32);
        scales[j + 8]  = (int8_t)(((rs[j]     >>  4) | (((rs[8 + j] >> 4) & 3) << 4)) - 32);
        scales[j + 12] = (int8_t)(((rs[4 + j] >>  4) | (((rs[8 + j] >> 6) & 3) << 4)) - 32);
    }
    int is = 0;
    uint8_t m = 1;
    for (int half = 0; half < 2; half++) {
        const uint8_t* q = qs + half * 32;
        for (int j = 0; j < 4; j++) {
            int shift = 2 * j;
            for (int sub = 0; sub < 2; sub++) {
                float dl = dall * scales[is++];
                const uint8_t* hm = hmask + sub * 16;
                float* y = d + half * 128 + j * 32 + sub * 16;
                for (int l = 0; l < 16; l++) {
                    int qv = (q[sub * 16 + l] >> shift) & 3;
                    if (!(hm[l] & m)) qv -= 4;
                    y[l] = dl * qv;
                }
            }
            m <<= 1;
        }
    }
}

static inline void k4_scale_min(const uint8_t* sc12, int j, uint8_t* sc, uint8_t* mn) {
    if (j < 4) {
        *sc = sc12[j] & 63;
        *mn = sc12[j + 4] & 63;
    } else {
        *sc = (sc12[j + 4] & 0xF) | ((sc12[j - 4] >> 6) << 4);
        *mn = (sc12[j + 4] >> 4) | ((sc12[j] >> 6) << 4);
    }
}

static void deq_q4_k(const uint8_t* s, float* d) {
    float dall = f16_to_f32(load_u16(s));
    float dmin = f16_to_f32(load_u16(s + 2));
    const uint8_t* sc12 = s + 4;
    const uint8_t* qs = s + 16;
    for (int j = 0; j < 4; j++) {
        uint8_t sc, mn;
        const uint8_t* q = qs + 32 * j;
        k4_scale_min(sc12, 2 * j, &sc, &mn);
        float d1 = dall * sc, m1 = dmin * mn;
        k4_scale_min(sc12, 2 * j + 1, &sc, &mn);
        float d2 = dall * sc, m2 = dmin * mn;
        float* y = d + 64 * j;
        for (int l = 0; l < 32; l++) y[l] = d1 * (q[l] & 0xF) - m1;
        for (int l = 0; l < 32; l++) y[32 + l] = d2 * (q[l] >> 4) - m2;
    }
}

static void deq_q5_k(const uint8_t* s, float* d) {
    float dall = f16_to_f32(load_u16(s));
    float dmin = f16_to_f32(load_u16(s + 2));
    const uint8_t* sc12 = s + 4;
    const uint8_t* qh = s + 16;
    const uint8_t* qs = s + 48;
    uint8_t u1 = 1, u2 = 2;
    for (int j = 0; j < 4; j++) {
        uint8_t sc, mn;
        const uint8_t* q = qs + 32 * j;
        k4_scale_min(sc12, 2 * j, &sc, &mn);
        float d1 = dall * sc, m1 = dmin * mn;
        k4_scale_min(sc12, 2 * j + 1, &sc, &mn);
        float d2 = dall * sc, m2 = dmin * mn;
        float* y = d + 64 * j;
        for (int l = 0; l < 32; l++)
            y[l] = d1 * ((q[l] & 0xF) + ((qh[l] & u1) ? 16 : 0)) - m1;
        for (int l = 0; l < 32; l++)
            y[32 + l] = d2 * ((q[l] >> 4) + ((qh[l] & u2) ? 16 : 0)) - m2;
        u1 <<= 2;
        u2 <<= 2;
    }
}

static void deq_q6_k(const uint8_t* s, float* d) {
    const uint8_t* ql = s;
    const uint8_t* qh = s + 128;
    const int8_t* sc = (const int8_t*)(s + 192);
    float dall = f16_to_f32(load_u16(s + 208));
    for (int half = 0; half < 2; half++) {
        const uint8_t* l_ = ql + 64 * half;
        const uint8_t* h_ = qh + 32 * half;
        const int8_t* s_ = sc + 8 * half;
        float* y = d + 128 * half;
        for (int l = 0; l < 32; l++) {
            int is = l / 16;
            int q1 = (int)((l_[l] & 0xF) | (((h_[l] >> 0) & 3) << 4)) - 32;
            int q2 = (int)((l_[l + 32] & 0xF) | (((h_[l] >> 2) & 3) << 4)) - 32;
            int q3 = (int)((l_[l] >> 4) | (((h_[l] >> 4) & 3) << 4)) - 32;
            int q4 = (int)((l_[l + 32] >> 4) | (((h_[l] >> 6) & 3) << 4)) - 32;
            y[l] = dall * s_[is] * q1;
            y[l + 32] = dall * s_[is + 2] * q2;
            y[l + 64] = dall * s_[is + 4] * q3;
            y[l + 96] = dall * s_[is + 6] * q4;
        }
    }
}

/* ---- type table (ids match sdtpu/io/gguf.py GGML_* constants) ---- */
typedef void (*block_fn)(const uint8_t*, float*);
typedef struct {
    int type_id;
    int block_elems;
    int block_bytes;
    block_fn fn;
} qtype;

static const qtype QTYPES[] = {
    {2, 32, 18, deq_q4_0},   {3, 32, 20, deq_q4_1},  {6, 32, 22, deq_q5_0},
    {7, 32, 24, deq_q5_1},   {8, 32, 34, deq_q8_0},  {10, 256, 84, deq_q2_k},
    {11, 256, 110, deq_q3_k}, {12, 256, 144, deq_q4_k}, {13, 256, 176, deq_q5_k},
    {14, 256, 210, deq_q6_k},
};

/* ---- threaded driver ---- */
typedef struct {
    const uint8_t* src;
    float* dst;
    const qtype* qt;
    int64_t begin, end; /* block range */
} job;

static void* worker(void* arg) {
    job* j = (job*)arg;
    for (int64_t b = j->begin; b < j->end; b++)
        j->qt->fn(j->src + b * j->qt->block_bytes, j->dst + b * j->qt->block_elems);
    return NULL;
}

typedef struct {
    const uint8_t* src;
    float* dst;
    int64_t begin, end;
    int bf16;
} cjob;

static void* cworker(void* arg) {
    cjob* j = (cjob*)arg;
    if (j->bf16) {
        for (int64_t i = j->begin; i < j->end; i++) {
            uint32_t bits = (uint32_t)load_u16(j->src + 2 * i) << 16;
            memcpy(j->dst + i, &bits, 4);
        }
    } else {
        for (int64_t i = j->begin; i < j->end; i++)
            j->dst[i] = f16_to_f32(load_u16(j->src + 2 * i));
    }
    return NULL;
}

#define MAX_THREADS 32

static PyObject* py_dequant(PyObject* self, PyObject* args) {
    int type_id;
    Py_buffer src, dst;
    long long n_elems;
    int n_threads = 8;
    if (!PyArg_ParseTuple(args, "iy*w*L|i", &type_id, &src, &dst, &n_elems, &n_threads))
        return NULL;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > MAX_THREADS) n_threads = MAX_THREADS;

    const uint8_t* sp = (const uint8_t*)src.buf;
    float* dp = (float*)dst.buf;
    int ok = 0;

    if (type_id == 1 || type_id == 30) { /* f16 / bf16 */
        if ((long long)src.len < 2 * n_elems || (long long)dst.len < 4 * n_elems)
            goto size_err;
        pthread_t th[MAX_THREADS];
        cjob jobs[MAX_THREADS];
        int64_t per = (n_elems + n_threads - 1) / n_threads;
        int nt = 0;
        Py_BEGIN_ALLOW_THREADS
        for (int t = 0; t < n_threads; t++) {
            int64_t b = t * per, e = b + per;
            if (b >= n_elems) break;
            if (e > n_elems) e = n_elems;
            jobs[nt] = (cjob){sp, dp, b, e, type_id == 30};
            pthread_create(&th[nt], NULL, cworker, &jobs[nt]);
            nt++;
        }
        for (int t = 0; t < nt; t++) pthread_join(th[t], NULL);
        Py_END_ALLOW_THREADS
        ok = 1;
    } else {
        const qtype* qt = NULL;
        for (size_t i = 0; i < sizeof(QTYPES) / sizeof(QTYPES[0]); i++)
            if (QTYPES[i].type_id == type_id) qt = &QTYPES[i];
        if (!qt) {
            PyBuffer_Release(&src);
            PyBuffer_Release(&dst);
            PyErr_Format(PyExc_ValueError, "unsupported ggml type %d", type_id);
            return NULL;
        }
        int64_t n_blocks = n_elems / qt->block_elems;
        if ((long long)src.len < n_blocks * qt->block_bytes ||
            (long long)dst.len < 4 * n_blocks * qt->block_elems)
            goto size_err;
        pthread_t th[MAX_THREADS];
        job jobs[MAX_THREADS];
        int64_t per = (n_blocks + n_threads - 1) / n_threads;
        int nt = 0;
        Py_BEGIN_ALLOW_THREADS
        for (int t = 0; t < n_threads; t++) {
            int64_t b = t * per, e = b + per;
            if (b >= n_blocks) break;
            if (e > n_blocks) e = n_blocks;
            jobs[nt] = (job){sp, dp, qt, b, e};
            pthread_create(&th[nt], NULL, worker, &jobs[nt]);
            nt++;
        }
        for (int t = 0; t < nt; t++) pthread_join(th[t], NULL);
        Py_END_ALLOW_THREADS
        ok = 1;
    }

    PyBuffer_Release(&src);
    PyBuffer_Release(&dst);
    if (ok) Py_RETURN_NONE;
    Py_RETURN_NONE;

size_err:
    PyBuffer_Release(&src);
    PyBuffer_Release(&dst);
    PyErr_SetString(PyExc_ValueError, "buffer too small for n_elems");
    return NULL;
}

/* ---- keep-quant split extraction -------------------------------------
 *
 * q8_0 / q4_0 blocks are [f16 scale | payload]; the keep-quant loader wants
 * the payload contiguous (int8 / packed nibbles) and the scales as f32,
 * WITHOUT dequantizing (reference keeps blocks end-to-end,
 * src/model_io/tensor_storage.h:16).  numpy does this with a strided
 * 34-byte-period copy at ~200 MB/s on the 1-core host (~60 s for a 13 GB
 * FLUX q8_0); per-block memcpy here runs at memory bandwidth.
 */
typedef struct {
    const uint8_t* src;
    uint8_t* qdst;
    float* sdst;
    int block_bytes;  /* total block stride */
    int payload;      /* payload bytes per block (block_bytes - 2) */
    int64_t begin, end;
} sjob;

static void* sworker(void* arg) {
    sjob* j = (sjob*)arg;
    for (int64_t b = j->begin; b < j->end; b++) {
        const uint8_t* blk = j->src + b * j->block_bytes;
        j->sdst[b] = f16_to_f32(load_u16(blk));
        memcpy(j->qdst + b * j->payload, blk + 2, j->payload);
    }
    return NULL;
}

static PyObject* py_extract_split(PyObject* self, PyObject* args) {
    int type_id;
    Py_buffer src, qdst, sdst;
    long long n_elems;
    int n_threads = 8;
    if (!PyArg_ParseTuple(args, "iy*w*w*L|i", &type_id, &src, &qdst, &sdst,
                          &n_elems, &n_threads))
        return NULL;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > MAX_THREADS) n_threads = MAX_THREADS;

    int block_elems, block_bytes;
    if (type_id == 8) {        /* q8_0: 2 + 32×int8 */
        block_elems = 32; block_bytes = 34;
    } else if (type_id == 2) { /* q4_0: 2 + 16 packed nibble bytes */
        block_elems = 32; block_bytes = 18;
    } else {
        PyBuffer_Release(&src); PyBuffer_Release(&qdst); PyBuffer_Release(&sdst);
        PyErr_Format(PyExc_ValueError, "extract_split: unsupported type %d",
                     type_id);
        return NULL;
    }
    int payload = block_bytes - 2;
    int64_t n_blocks = n_elems / block_elems;
    if ((long long)src.len < n_blocks * block_bytes ||
        (long long)qdst.len < n_blocks * payload ||
        (long long)sdst.len < 4 * n_blocks) {
        PyBuffer_Release(&src); PyBuffer_Release(&qdst); PyBuffer_Release(&sdst);
        PyErr_SetString(PyExc_ValueError, "extract_split: buffer too small");
        return NULL;
    }

    pthread_t th[MAX_THREADS];
    sjob jobs[MAX_THREADS];
    int64_t per = (n_blocks + n_threads - 1) / n_threads;
    int nt = 0;
    Py_BEGIN_ALLOW_THREADS
    for (int t = 0; t < n_threads; t++) {
        int64_t b = t * per, e = b + per;
        if (b >= n_blocks) break;
        if (e > n_blocks) e = n_blocks;
        jobs[nt] = (sjob){(const uint8_t*)src.buf, (uint8_t*)qdst.buf,
                          (float*)sdst.buf, block_bytes, payload, b, e};
        pthread_create(&th[nt], NULL, sworker, &jobs[nt]);
        nt++;
    }
    for (int t = 0; t < nt; t++) pthread_join(th[t], NULL);
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&src);
    PyBuffer_Release(&qdst);
    PyBuffer_Release(&sdst);
    Py_RETURN_NONE;
}

static PyMethodDef methods[] = {
    {"dequant", py_dequant, METH_VARARGS,
     "dequant(type_id, src, dst_f32, n_elems, n_threads=8)"},
    {"extract_split", py_extract_split, METH_VARARGS,
     "extract_split(type_id, src, q_dst, scale_dst_f32, n_elems, n_threads=8)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_sdtpu_native", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit__sdtpu_native(void) {
    return PyModule_Create(&moduledef);
}
