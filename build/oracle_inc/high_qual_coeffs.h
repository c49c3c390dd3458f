/* Stand-in for libsamplerate's generated high_qual_coeffs.h (absent from the
** vendored reference tree).  Aliases SRC_SINC_BEST_QUALITY to the vendored
** mid-quality filter table.  Only affects resampling of encoder *input*
** material in tests; decode parity is decoder-vs-decoder and unaffected. */
#define slow_high_qual_coeffs slow_mid_qual_coeffs
