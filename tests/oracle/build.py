"""Build the golden-oracle shared library from the read-only reference tree.

Compiles the reference decoder/encoder cores (portable C++ per
reference README.md:109-116) together with tests/oracle/shim.cpp into
build/liboracle.so.  Nothing is copied from the reference tree; it is compiled
in place with -I include paths.  If the reference tree is missing or the build
fails, oracle-backed tests skip.
"""

import os
import subprocess

REF = os.environ.get("DCS_REFERENCE_ROOT", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
BUILD_DIR = os.path.join(REPO, "build")
LIB = os.path.join(BUILD_DIR, "liboracle.so")


def build(force=False):
    """Build liboracle.so if needed; return its path or None on failure."""
    if not os.path.isdir(REF):
        return None
    shim = os.path.join(REPO, "tests", "oracle", "shim.cpp")
    inc = os.path.join(BUILD_DIR, "oracle_inc")
    cxx_srcs = [
        shim,
        f"{REF}/DCSDecoder/DCSDecoder.cpp",
        f"{REF}/DCSDecoder/DCSDecoderNative.cpp",
        f"{REF}/DCSEncoder/DCSEncoder.cpp",
        f"{REF}/DCSDecoder/adsp2100/2100dasm.cpp",
        f"{REF}/DCSDecoder/adsp2100/adsp2100.cpp",
    ]
    c_srcs = [
        f"{REF}/libsamplerate/src/samplerate.c",
        f"{REF}/libsamplerate/src/src_sinc.c",
        f"{REF}/libsamplerate/src/src_linear.c",
        f"{REF}/libsamplerate/src/src_zoh.c",
    ]
    if not force and os.path.exists(LIB):
        # rebuild only if the shim is newer than the library
        if os.path.getmtime(LIB) >= os.path.getmtime(shim):
            return LIB
    os.makedirs(BUILD_DIR, exist_ok=True)
    incflags = [
        f"-I{inc}", f"-I{REF}/DCSDecoder", f"-I{REF}/DCSEncoder",
        f"-I{REF}/libsamplerate/src",
    ]
    objs = []
    try:
        for src in c_srcs:
            obj = os.path.join(BUILD_DIR, os.path.basename(src) + ".o")
            subprocess.run(
                ["gcc", "-O2", "-fPIC", "-w", "-c", *incflags, src, "-o", obj],
                check=True, capture_output=True, text=True)
            objs.append(obj)
        for src in cxx_srcs:
            obj = os.path.join(BUILD_DIR, os.path.basename(src) + ".o")
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-std=c++17", "-w", "-c",
                 "-DLSB_FIRST", "-DHAS_ADSP2101=1", "-DHAS_ADSP2105=1",
                 "-include", f"{inc}/msvc_compat.h", *incflags, src, "-o", obj],
                check=True, capture_output=True, text=True)
            objs.append(obj)
        subprocess.run(
            ["g++", "-shared", *objs, "-o", LIB, "-lm"],
            check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        print("oracle build failed:\n", e.stderr[-4000:])
        return None
    return LIB


if __name__ == "__main__":
    path = build(force=True)
    print(path or "BUILD FAILED")
