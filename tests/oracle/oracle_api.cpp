// C API over the VTM-10.0 reference library for golden testing only.
// Thin glue replicating the dispatch in TrQuant::xT/xIT (TrQuant.cpp:768-905)
// so our JAX kernels can be compared bit-exactly against the reference.
#include "CommonDef.h"
#include "TrQuant_EMT.h"
#include "Rom.h"
#include "RdCost.h"

typedef void (*FwdTrans)(const TCoeff*, TCoeff*, int, int, int, int);
typedef void (*InvTrans)(const TCoeff*, TCoeff*, int, int, int, int, const TCoeff, const TCoeff);

static const FwdTrans kFwd[3][6] = {
  { fastForwardDCT2_B2, fastForwardDCT2_B4, fastForwardDCT2_B8,
    fastForwardDCT2_B16, fastForwardDCT2_B32, fastForwardDCT2_B64 },
  { nullptr, fastForwardDCT8_B4, fastForwardDCT8_B8,
    fastForwardDCT8_B16, fastForwardDCT8_B32, nullptr },
  { nullptr, fastForwardDST7_B4, fastForwardDST7_B8,
    fastForwardDST7_B16, fastForwardDST7_B32, nullptr },
};
static const InvTrans kInv[3][6] = {
  { fastInverseDCT2_B2, fastInverseDCT2_B4, fastInverseDCT2_B8,
    fastInverseDCT2_B16, fastInverseDCT2_B32, fastInverseDCT2_B64 },
  { nullptr, fastInverseDCT8_B4, fastInverseDCT8_B8,
    fastInverseDCT8_B16, fastInverseDCT8_B32, nullptr },
  { nullptr, fastInverseDST7_B4, fastInverseDST7_B8,
    fastInverseDST7_B16, fastInverseDST7_B32, nullptr },
};

static int flog2(int v) { int r = 0; while (v > 1) { v >>= 1; ++r; } return r; }

extern "C" {

// trType: 0=DCT2, 1=DCT8, 2=DST7. src/dst are row-major h x w int32.
void oracle_fwd_transform(const int* src, int* dst, int w, int h,
                          int trH, int trV, int bitDepth) {
  const int shift1 = flog2(w) + bitDepth + 6 - 15;
  const int shift2 = flog2(h) + 6;
  int skipW = (trH != 0 && w == 32) ? 16 : (w > 32 ? w - 32 : 0);
  int skipH = (trV != 0 && h == 32) ? 16 : (h > 32 ? h - 32 : 0);
  TCoeff* tmp = new TCoeff[w * h];
  kFwd[trH][flog2(w) - 1](src, tmp, shift1, h, 0, skipW);
  kFwd[trV][flog2(h) - 1](tmp, dst, shift2, w, skipW, skipH);
  delete[] tmp;
}

void oracle_inv_transform(const int* src, int* dst, int w, int h,
                          int trH, int trV, int bitDepth) {
  const int shift1 = 6 + 1;
  const int shift2 = (6 + 15 - 1) - bitDepth;
  const TCoeff cmin = -(1 << 15), cmax = (1 << 15) - 1;
  int skipW = (trH != 0 && w == 32) ? 16 : (w > 32 ? w - 32 : 0);
  int skipH = (trV != 0 && h == 32) ? 16 : (h > 32 ? h - 32 : 0);
  TCoeff* tmp = new TCoeff[w * h];
  kInv[trV][flog2(h) - 1](src, tmp, shift1, w, skipW, skipH, cmin, cmax);
  kInv[trH][flog2(w) - 1](tmp, dst, shift2, h, 0, skipW, cmin, cmax);
  delete[] tmp;
}

// org/cur are row-major h x w int16 (Pel). Returns VTM SATD (DF_HAD path).
long long oracle_satd(const short* org, const short* cur, int w, int h,
                      int bitDepth) {
  static RdCost rd;  // function-pointer tables set up in ctor/init
  CPelBuf o(org, w, w, h);
  CPelBuf c(cur, w, w, h);
  DistParam dp;
  rd.setDistParam(dp, o, c, bitDepth, COMPONENT_Y, true /*useHadamard*/);
  return (long long)dp.distFunc(dp);
}

}  // extern "C"
