// Reference-codec conformance oracle: compiles the ScreenPressor 4.2 source
// (read from /root/reference at build time; nothing copied) into a Linux
// shared library with a C API.  Used by tests as the definitive oracle for
// v2/v3/v4 stream semantics wherever FFmpeg's scpr decoder is absent (v4)
// or disagrees.
#include "windows.h"

// Pre-empt the reference's logging.h: GCC rejects its arg-swallowing
// `#define lprintf()`; provide a variadic no-op instead.
#include <stdio.h>
#define LOGGING_H
FILE *logF = 0;
#define lprintf(...) ((void)0)

// ---- shim implementations -------------------------------------------------
extern "C" {

HANDLE CreateEvent(LPSECURITY_ATTRIBUTES, BOOL manual, BOOL initial, LPCSTR) {
    ShimHandle* h = new ShimHandle();
    h->kind = 0;
    pthread_mutex_init(&h->mu, 0);
    pthread_cond_init(&h->cv, 0);
    h->manual = manual;
    h->signaled = initial;
    return h;
}
BOOL SetEvent(HANDLE hv) {
    ShimHandle* h = (ShimHandle*)hv;
    pthread_mutex_lock(&h->mu);
    h->signaled = 1;
    pthread_cond_broadcast(&h->cv);
    pthread_mutex_unlock(&h->mu);
    return 1;
}
BOOL ResetEvent(HANDLE hv) {
    ShimHandle* h = (ShimHandle*)hv;
    pthread_mutex_lock(&h->mu);
    h->signaled = 0;
    pthread_mutex_unlock(&h->mu);
    return 1;
}
DWORD WaitForSingleObject(HANDLE hv, DWORD) {
    ShimHandle* h = (ShimHandle*)hv;
    if (h->kind == 1) {
        pthread_join(h->th, 0);
        return 0;
    }
    pthread_mutex_lock(&h->mu);
    while (!h->signaled) pthread_cond_wait(&h->cv, &h->mu);
    if (!h->manual) h->signaled = 0;
    pthread_mutex_unlock(&h->mu);
    return 0;
}
DWORD WaitForMultipleObjects(DWORD n, const HANDLE* hs, BOOL waitAll, DWORD ms) {
    (void)waitAll;  // only waitAll=TRUE is used by the reference
    for (DWORD i = 0; i < n; i++) WaitForSingleObject(hs[i], ms);
    return 0;
}
BOOL CloseHandle(HANDLE hv) {
    ShimHandle* h = (ShimHandle*)hv;
    if (h->kind == 0) {
        pthread_mutex_destroy(&h->mu);
        pthread_cond_destroy(&h->cv);
    }
    delete h;
    return 1;
}
static void* shim_thread_tramp(void* p) {
    void** pp = (void**)p;
    LPTHREAD_START_ROUTINE fn = (LPTHREAD_START_ROUTINE)pp[0];
    LPVOID param = pp[1];
    free(pp);
    fn(param);
    return 0;
}
HANDLE CreateThread(LPSECURITY_ATTRIBUTES, size_t, LPTHREAD_START_ROUTINE fn,
                    LPVOID param, DWORD, LPDWORD tid) {
    ShimHandle* h = new ShimHandle();
    h->kind = 1;
    void** pp = (void**)malloc(2 * sizeof(void*));
    pp[0] = (void*)fn;
    pp[1] = param;
    pthread_create(&h->th, 0, shim_thread_tramp, pp);
    if (tid) *tid = 1;
    return h;
}
}  // extern "C"

// thread-local f0 plumbing (reference: drvproc.cpp:189-197 via Win32 TLS)
static __thread int g_f0val = 32;
void SetThreadLocalInt(int v) { g_f0val = v; }
int GetThreadLocalInt() { return g_f0val; }

// ---- reference sources ----------------------------------------------------
// Included from the (read-only) reference checkout at build time; nothing is
// copied into this repository.  REF_DIR is passed by the build
// (-DREF_DIR=/root/reference); the library cannot be built without it.
#define REF_STR2(x) #x
#define REF_STR(x) REF_STR2(x)
#define REF_SRC(f) REF_STR(REF_DIR/f)
#include REF_SRC(sub.cpp)
#include REF_SRC(ans_contexts.cpp)
#include REF_SRC(squad.cpp)
#include REF_SRC(screencap.cpp)

// ---- C API ----------------------------------------------------------------
struct RefHandle {
    IScreenCapt* sc;
    int w, h, stride;
};

extern "C" {

void* refora_new(int version, int w, int h, int msr_hi, int msr_lo,
                 int loss) {
    RefHandle* rh = new RefHandle();
    rh->w = w;
    rh->h = h;
    rh->stride = (w * 3 + 3) & ~3;
    if (version == 2)
        rh->sc = new CScreenCapt<UseRC>(2);
    else {
        CScreenCapt<UseANS>* c = new CScreenCapt<UseANS>(version);
        c->setCx6f0(version >= 4 ? 32 : 64);
        rh->sc = c;
    }
    CodecParameters p;
    p.width = w;
    p.height = h;
    p.bits_per_pixel = 24;
    p.redmask = p.greenmask = p.bluemask = 0;
    p.high_range_x = p.high_range_y = msr_hi;
    p.low_range_x = p.low_range_y = msr_lo;
    p.loss = loss;
    rh->sc->Init(&p);
    return rh;
}

void refora_free(void* hv) {
    RefHandle* rh = (RefHandle*)hv;
    rh->sc->Deinit();
    delete rh->sc;
    delete rh;
}

// src: DIB rows (bottom-up BGR), tightly packed W*3 per row.
// want_ftype: 0 request I, 1 request P.  Returns byte count, fills ftype_out.
long refora_compress(void* hv, const BYTE* src, int want_ftype, BYTE* dst,
                     long cap, int* ftype_out) {
    RefHandle* rh = (RefHandle*)hv;
    std::vector<BYTE> buf((size_t)rh->stride * rh->h, 0);
    for (int y = 0; y < rh->h; y++)
        memcpy(&buf[(size_t)y * rh->stride], src + (size_t)y * rh->w * 3,
               (size_t)rh->w * 3);
    int ftype = want_ftype;
    long n = rh->sc->CompressFrame(&buf[0], dst, cap, ftype);
    *ftype_out = ftype;
    return n;
}

int refora_decompress(void* hv, const BYTE* src, long n, int ftype, BYTE* dst) {
    RefHandle* rh = (RefHandle*)hv;
    std::vector<BYTE> buf((size_t)rh->stride * (rh->h + 512), 0);  // slack: the reference trusts streams and can overrun on foreign input
    std::vector<BYTE> in(src, src + n);
    try {
        rh->sc->DecompressFrame(&in[0], n, &buf[0], ftype);
    } catch (...) {
        return -1;
    }
    for (int y = 0; y < rh->h; y++)
        memcpy(dst + (size_t)y * rh->w * 3, &buf[(size_t)y * rh->stride],
               (size_t)rh->w * 3);
    return 0;
}

}  // extern "C"
