// Minimal pthread-backed Win32 shim: just enough to compile and run the
// reference codec's core (CScreenCapt/ScreenCodec/CSquad/RansMTCoder) on
// Linux as a conformance oracle.  Not part of the framework.
#ifndef SHIM_WINDOWS_H
#define SHIM_WINDOWS_H

// Pull in every std header the reference uses BEFORE defining min/max
// macros, so the macros only affect reference code.
#include <algorithm>
#include <stdexcept>
#include <vector>

#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef int BOOL;
typedef long long __int64;
typedef unsigned char BYTE;
typedef unsigned short WORD;
typedef unsigned int DWORD;
typedef int LONG;
typedef unsigned int UINT;
typedef void* HANDLE;
typedef void* LPVOID;
typedef DWORD* LPDWORD;
typedef void* LPSECURITY_ATTRIBUTES;
typedef const char* LPCSTR;
typedef char* LPSTR;
typedef void* HINSTANCE;
typedef void* HMODULE;

#define WINAPI
#define TRUE 1
#define FALSE 0
#define INFINITE 0xFFFFFFFFu
#define WAIT_OBJECT_0 0
// MSVC-era global min/max (the real windows.h defines these as macros)
#define min(a, b) (((a) < (b)) ? (a) : (b))
#define max(a, b) (((a) > (b)) ? (a) : (b))
#define __forceinline inline __attribute__((always_inline))

typedef union _LARGE_INTEGER {
    struct { DWORD LowPart; LONG HighPart; } u;
    long long QuadPart;
} LARGE_INTEGER;

typedef struct _SYSTEM_INFO {
    DWORD dwNumberOfProcessors;
} SYSTEM_INFO;

typedef pthread_mutex_t CRITICAL_SECTION;

#ifdef __cplusplus
extern "C" {
#endif

// ---- handles -------------------------------------------------------------
typedef struct ShimHandle {
    int kind;  // 0 = event, 1 = thread
    // event
    pthread_mutex_t mu;
    pthread_cond_t cv;
    int manual, signaled;
    // thread
    pthread_t th;
} ShimHandle;

typedef DWORD (WINAPI *LPTHREAD_START_ROUTINE)(LPVOID);

HANDLE CreateEvent(LPSECURITY_ATTRIBUTES sa, BOOL manual, BOOL initial, LPCSTR name);
BOOL SetEvent(HANDLE h);
BOOL ResetEvent(HANDLE h);
DWORD WaitForSingleObject(HANDLE h, DWORD ms);
DWORD WaitForMultipleObjects(DWORD n, const HANDLE* hs, BOOL waitAll, DWORD ms);
BOOL CloseHandle(HANDLE h);
HANDLE CreateThread(LPSECURITY_ATTRIBUTES sa, size_t stack,
                    LPTHREAD_START_ROUTINE fn, LPVOID param, DWORD flags,
                    LPDWORD tid);
static inline DWORD SignalObjectAndWait(HANDLE sig, HANDLE wait, DWORD ms, BOOL alertable) {
    BOOL SetEvent(HANDLE);
    DWORD WaitForSingleObject(HANDLE, DWORD);
    SetEvent(sig);
    return WaitForSingleObject(wait, ms);
}

static inline void InitializeCriticalSection(CRITICAL_SECTION* cs) { pthread_mutex_init(cs, 0); }
static inline void DeleteCriticalSection(CRITICAL_SECTION* cs) { pthread_mutex_destroy(cs); }
static inline void EnterCriticalSection(CRITICAL_SECTION* cs) { pthread_mutex_lock(cs); }
static inline void LeaveCriticalSection(CRITICAL_SECTION* cs) { pthread_mutex_unlock(cs); }

static inline BOOL QueryPerformanceCounter(LARGE_INTEGER* li) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    li->QuadPart = (long long)ts.tv_sec * 1000000000LL + ts.tv_nsec;
    return 1;
}
static inline BOOL QueryPerformanceFrequency(LARGE_INTEGER* li) {
    li->QuadPart = 1000000000LL;
    return 1;
}
// single worker: deterministic band structure matching our 1-band encoder
static inline void GetSystemInfo(SYSTEM_INFO* si) { si->dwNumberOfProcessors = 1; }
static inline DWORD GetModuleFileNameA(HMODULE m, LPSTR buf, DWORD n) {
    if (n) buf[0] = 0;
    return 0;
}
#define GetModuleFileName GetModuleFileNameA

#ifdef __cplusplus
}
#endif

#endif
