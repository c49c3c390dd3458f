/* Portability shims for compiling the reference's MSVC-flavored sources with
** g++ on Linux (injected with -include; the reference tree is not modified). */
#pragma once
#include <string.h>
#include <stdio.h>
#include <stdarg.h>
#ifdef __cplusplus
static inline int _vscprintf(const char* f, va_list a) {
    va_list c; va_copy(c, a); int r = vsnprintf(nullptr, 0, f, c); va_end(c); return r;
}
#endif
#define vsprintf_s(buf, size, fmt, va) vsnprintf(buf, size, fmt, va)
#define sprintf_s snprintf
#ifdef __cplusplus
static inline int fopen_s(FILE** fp, const char* name, const char* mode) {
    *fp = fopen(name, mode); return *fp ? 0 : 1;
}
#endif

#ifndef INLINE
#define INLINE static inline
#endif

#ifndef _countof
#define _countof(a) (sizeof(a)/sizeof((a)[0]))
#endif

#ifdef __cplusplus
#include <cstdio>
#include <cstddef>
template <std::size_t N>
static inline int strcpy_s(char (&dst)[N], const char* src) {
    return std::snprintf(dst, N, "%s", src) < 0 ? 1 : 0;
}
#endif
