// C API over the VTM-10.0 reference library for golden testing only.
// Thin glue replicating the dispatch in TrQuant::xT/xIT (TrQuant.cpp:768-905)
// so our JAX kernels can be compared bit-exactly against the reference.
// Pre-include the standard library (include guards make later includes
// no-ops) so the access-override hack below never touches std headers.
#include <algorithm>
#include <array>
#include <atomic>
#include <cassert>
#include <cmath>
#include <cstdarg>
#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <iomanip>
#include <iostream>
#include <iterator>
#include <limits>
#include <list>
#include <map>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <type_traits>
#include <unordered_map>
#include <utility>
#include <vector>

// test-only oracle: expose private members of the reference classes
#define private public
#define protected public
#include "CommonDef.h"
#include "TrQuant_EMT.h"
#include "Rom.h"
#include "RdCost.h"
#include "IntraPrediction.h"
#include "MatrixIntraPrediction.h"
#include "Unit.h"
#include "Slice.h"
#include "CodingStructure.h"
#include "ContextModelling.h"
#include "../EncoderLib/BinEncoder.h"
#include "../EncoderLib/CABACWriter.h"
#include "../DecoderLib/BinDecoder.h"
#include "../DecoderLib/VLCReader.h"
#undef private
#undef protected

typedef void (*OFwdFn)(const TCoeff*, TCoeff*, int, int, int, int);
typedef void (*OInvFn)(const TCoeff*, TCoeff*, int, int, int, int, const TCoeff, const TCoeff);

static const OFwdFn kFwd[3][6] = {
  { fastForwardDCT2_B2, fastForwardDCT2_B4, fastForwardDCT2_B8,
    fastForwardDCT2_B16, fastForwardDCT2_B32, fastForwardDCT2_B64 },
  { nullptr, fastForwardDCT8_B4, fastForwardDCT8_B8,
    fastForwardDCT8_B16, fastForwardDCT8_B32, nullptr },
  { nullptr, fastForwardDST7_B4, fastForwardDST7_B8,
    fastForwardDST7_B16, fastForwardDST7_B32, nullptr },
};
static const OInvFn kInv[3][6] = {
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

// ---------------------------------------------------------------------------
// Intra prediction oracle: drives the real initPredIntraParams /
// xFilterReferenceSamples / xPredIntraPlanar / xPredIntraDc / xPredIntraAng
// member functions on caller-provided reference lines. Only the 15-line
// dispatch + planar/DC PDPC epilogue of predIntraAng (which needs a full
// CodingStructure) is replicated here as glue.
// ---------------------------------------------------------------------------
struct OracleIntra : public IntraPrediction {
  // top/left: length 2*w+3 / 2*h+3, index 0 = corner (our layout).
  void predict(int w, int h, int mode, int bitDepth, const short* top,
               const short* left, short* out, int isLumaFlag) {
    const ComponentID compID = isLumaFlag ? COMPONENT_Y : COMPONENT_Cb;
    UnitArea ua(isLumaFlag ? CHROMA_400 : CHROMA_420,
                Area(128, 128, isLumaFlag ? w : 2 * w, isLumaFlag ? h : 2 * h));
    CodingUnit cu(ua);
    PredictionUnit pu(ua);
    pu.cu = &cu;
    cu.firstPU = &pu;
    cu.ispMode = NOT_INTRA_SUBPARTITIONS;
    cu.bdpcmMode = cu.bdpcmModeChroma = 0;
    cu.mipFlag = false;
    pu.multiRefIdx = 0;
    if (isLumaFlag) {
      pu.intraDir[0] = mode;
    } else {
      pu.intraDir[0] = PLANAR_IDX;
      pu.intraDir[1] = mode;   // direct chroma mode (not DM)
    }
    SPS sps;
    sps.setBitDepth(CHANNEL_TYPE_LUMA, bitDepth);
    sps.setBitDepth(CHANNEL_TYPE_CHROMA, bitDepth);

    const CompArea& area = cu.blocks[compID];
    setReferenceArrayLengths(area);
    initPredIntraParams(pu, area, sps);

    const int stride = 2 * w + 3;
    m_refBufferStride[compID] = stride;
    Pel* unf = m_refBuffer[compID][PRED_BUF_UNFILTERED];
    Pel* fil = m_refBuffer[compID][PRED_BUF_FILTERED];
    // row 0 = [corner, top...]; row 1 (at +stride) = [corner, left...]
    for (int i = 0; i < stride; i++) unf[i] = top[i];
    unf[stride] = left[0];
    for (int i = 1; i < 2 * h + 3; i++) unf[stride + i] = left[i];
    if (m_ipaParam.refFilterFlag) {
      xFilterReferenceSamples(unf, fil, area, sps, 0);
    }

    PelBuf dst(out, w, w, h);
    CPelBuf src(getPredictorPtr(compID), stride, 2);
    ClpRng clpRng;
    clpRng.min = 0; clpRng.max = (1 << bitDepth) - 1;
    clpRng.bd = bitDepth; clpRng.n = 0;
    const ChannelType chType = toChannelType(compID);
    if (mode == PLANAR_IDX) xPredIntraPlanar(src, dst);
    else if (mode == DC_IDX) xPredIntraDc(src, dst, chType, false);
    else xPredIntraAng(src, dst, chType, clpRng);

    if (m_ipaParam.applyPDPC && (mode == PLANAR_IDX || mode == DC_IDX)) {
      const int scale = ((floorLog2(w) - 2 + floorLog2(h) - 2 + 2) >> 2);
      for (int y = 0; y < h; y++) {
        const int wT = 32 >> std::min(31, ((y << 1) >> scale));
        const Pel l = src.at(y + 1, 1);
        for (int x = 0; x < w; x++) {
          const int wL = 32 >> std::min(31, ((x << 1) >> scale));
          const Pel t = src.at(x + 1, 0);
          const Pel v = dst.at(x, y);
          dst.at(x, y) = v + ((wL * (l - v) + wT * (t - v) + 32) >> 6);
        }
      }
    }
  }
};

struct OracleIntraMrlImpl : public IntraPrediction {
  // top/left: length 2*dim + 3 + mri each, index 0 = corner of ref line
  // mri; angular modes only (extend_ref_line implies non-planar).
  void predict(int w, int h, int mode, int mri, int bitDepth,
               const short* top, const short* left, short* out) {
    UnitArea ua(CHROMA_400, Area(128, 128, w, h));
    CodingUnit cu(ua);
    PredictionUnit pu(ua);
    pu.cu = &cu;
    cu.firstPU = &pu;
    cu.ispMode = NOT_INTRA_SUBPARTITIONS;
    cu.bdpcmMode = cu.bdpcmModeChroma = 0;
    cu.mipFlag = false;
    pu.multiRefIdx = mri;
    pu.intraDir[0] = mode;
    SPS sps;
    sps.setBitDepth(CHANNEL_TYPE_LUMA, bitDepth);
    sps.setBitDepth(CHANNEL_TYPE_CHROMA, bitDepth);
    const CompArea& area = cu.blocks[COMPONENT_Y];
    setReferenceArrayLengths(area);
    initPredIntraParams(pu, area, sps);
    const int ntop = 2 * w + 3 + mri;
    const int nleft = 2 * h + 3 + mri;
    const int stride = std::max(ntop, nleft);
    m_refBufferStride[COMPONENT_Y] = stride;
    Pel* unf = m_refBuffer[COMPONENT_Y][PRED_BUF_UNFILTERED];
    for (int i = 0; i < ntop; i++) unf[i] = top[i];
    for (int i = 0; i < nleft; i++) unf[stride + i] = left[i];
    PelBuf dst(out, w, w, h);
    CPelBuf src(getPredictorPtr(COMPONENT_Y), stride, 2);
    ClpRng clpRng;
    clpRng.min = 0; clpRng.max = (1 << bitDepth) - 1;
    clpRng.bd = bitDepth; clpRng.n = 0;
    xPredIntraAng(src, dst, CHANNEL_TYPE_LUMA, clpRng);
  }
};

extern "C" {
void oracle_intra_pred_mrl(const short* top, const short* left, short* out,
                           int w, int h, int mode, int mri, int bitDepth) {
  static OracleIntraMrlImpl intra;
  static bool inited = false;
  if (!inited) { intra.init(CHROMA_420, 10); inited = true; }
  intra.predict(w, h, mode, mri, bitDepth, top, left, out);
}

// MatrixIntraPrediction is self-contained: refs in, w*h ints out.
void oracle_mip_pred(const short* top, const short* left, int* out,
                     int w, int h, int modeIdx, int transpose,
                     int bitDepth) {
  static MatrixIntraPrediction mip;
  const int stride = std::max(2 * w + 3, 2 * h + 3);
  std::vector<Pel> buf(stride * 2, 0);
  for (int i = 0; i < 2 * w + 3; i++) buf[i] = top[i];
  for (int i = 0; i < 2 * h + 3; i++) buf[stride + i] = left[i];
  CPelBuf src(buf.data(), stride, 2);
  mip.prepareInputForPred(src, Area(0, 0, w, h), bitDepth, COMPONENT_Y);
  mip.predBlock(out, modeIdx, transpose != 0, bitDepth, COMPONENT_Y);
}

void oracle_intra_pred(const short* top, const short* left, short* out,
                       int w, int h, int mode, int bitDepth, int isLuma) {
  static OracleIntra intra;
  static bool inited = false;
  if (!inited) { intra.init(CHROMA_420, 10); inited = true; }
  intra.predict(w, h, mode, bitDepth, top, left, out, isLuma);
}

// ---------------------------------------------------------------------------
// CABAC oracle. ops encode a mixed bin sequence:
//   kind 0: context bin (arg = ctxId), 1: EP bin, 2: terminating bin
// Returns number of bytes written to out.
// ---------------------------------------------------------------------------
int oracle_cabac_encode(const int* kinds, const int* bins, const int* args,
                        int n, int qp, int initId, unsigned char* out) {
  BinEncoder_Std enc;
  OutputBitstream bs;
  enc.init(&bs);
  enc.reset(qp, initId);  // standard context init + start()
  for (int i = 0; i < n; i++) {
    if (kinds[i] == 0)      enc.encodeBin(bins[i], args[i]);
    else if (kinds[i] == 1) enc.encodeBinEP(bins[i]);
    else                    enc.encodeBinTrm(bins[i]);
  }
  enc.finish();
  const std::vector<uint8_t>& fifo = bs.getFIFO();
  for (size_t i = 0; i < fifo.size(); i++) out[i] = fifo[i];
  return (int)fifo.size();
}

int oracle_cabac_decode(const unsigned char* data, int nbytes,
                        const int* kinds, const int* args, int n,
                        int qp, int initId, int* bins_out) {
  InputBitstream bs;
  bs.getFifo().assign(data, data + nbytes);
  BinDecoder_Std dec;
  dec.init(&bs);
  dec.reset(qp, initId);   // ctx init
  dec.start();
  for (int i = 0; i < n; i++) {
    if (kinds[i] == 0)      bins_out[i] = dec.decodeBin(args[i]);
    else if (kinds[i] == 1) bins_out[i] = dec.decodeBinEP();
    else                    bins_out[i] = dec.decodeBinTrm();
  }
  return 0;
}

// ---------------------------------------------------------------------------
// residual_coding oracle: drives the real CABACWriter::residual_coding on a
// caller-provided coefficient block with a minimally-constructed TU.
// Returns bytes written (stream terminated via encodeBinTrm(1)+finish).
// ---------------------------------------------------------------------------
static int residual_code_impl(const int* coeffs, int w, int h,
                              int isLumaFlag, int qp, int initId,
                              int depQuant, unsigned char* out,
                              int tsFlag = 0) {
  static bool romInit = false;
  if (!romInit) { initROM(); romInit = true; }

  static SPS* spsp = nullptr;
  static PPS* ppsp = nullptr;
  static Slice* slicep = nullptr;
  static CodingStructure* csp = nullptr;
  if (!spsp) {
    spsp = new SPS();
    spsp->setBitDepth(CHANNEL_TYPE_LUMA, 10);
    spsp->setBitDepth(CHANNEL_TYPE_CHROMA, 10);
    ppsp = new PPS();
    slicep = new Slice();
    slicep->setSignDataHidingEnabledFlag(false);
    slicep->setTSResidualCodingDisabledFlag(false);
    slicep->setSPS(spsp);
    static XUCache cache;
    csp = new CodingStructure(cache.cuCache, cache.puCache, cache.tuCache);
    csp->sps = spsp;
    csp->slice = slicep;
    csp->pps = ppsp;
  }
  SPS& sps = *spsp;
  CodingStructure& cs = *csp;
  slicep->setDepQuantEnabledFlag(depQuant != 0);

  const ComponentID compID = isLumaFlag ? COMPONENT_Y : COMPONENT_Cb;
  UnitArea ua(isLumaFlag ? CHROMA_400 : CHROMA_420,
              Area(0, 0, isLumaFlag ? w : 2 * w, isLumaFlag ? h : 2 * h));
  CodingUnit cu(ua);
  cu.cs = &cs;
  cu.bdpcmMode = cu.bdpcmModeChroma = 0;
  cu.sbtInfo = 0;
  cu.mtsFlag = 0;
  cu.ispMode = NOT_INTRA_SUBPARTITIONS;
  TransformUnit tu(ua);
  tu.cs = &cs;
  tu.cu = &cu;
  tu.mtsIdx[COMPONENT_Y] = tu.mtsIdx[COMPONENT_Cb] = tu.mtsIdx[COMPONENT_Cr]
      = MTS_DCT2_DCT2;
  sps.setTransformSkipEnabledFlag(tsFlag != 0);
  sps.setLog2MaxTransformSkipBlockSize(5);
  if (tsFlag) tu.mtsIdx[compID] = MTS_SKIP;
  cs.pcv = nullptr;  // not used on this path; avoid garbage reads
  static std::vector<TCoeff> cbuf[3];
  for (int i = 0; i < 3; i++) cbuf[i].assign(w * h, 0);
  // set coefficient pointers directly (tu.init needs cs->pcv)
  for (int i = 0; i < 3; i++) tu.m_coeffs[i] = cbuf[i].data();
  TCoeff* dst = cbuf[compID].data();
  for (int i = 0; i < w * h; i++) dst[i] = coeffs[i];

  BinEncoder_Std enc;
  OutputBitstream bs;
  enc.init(&bs);
  enc.reset(qp, initId);
  CABACWriter writer(enc);
  writer.residual_coding(tu, compID, nullptr);
  enc.encodeBinTrm(1);
  enc.finish();
  const std::vector<uint8_t>& fifo = bs.getFIFO();
  for (size_t i = 0; i < fifo.size(); i++) out[i] = fifo[i];
  return (int)fifo.size();
}

// ---------------------------------------------------------------------------
// Header-parsing oracle: run the real HLSyntaxReader over our RBSP bytes.
// Returns 0 on success and fills a small summary; throws/aborts on misparse.
// ---------------------------------------------------------------------------
int oracle_residual_code(const int* coeffs, int w, int h, int isLumaFlag,
                         int qp, int initId, unsigned char* out) {
  return residual_code_impl(coeffs, w, h, isLumaFlag, qp, initId, 0, out);
}

// transform-skip variant: codes ts_flag(1) + residual_codingTS
int oracle_residual_code_ts(const int* coeffs, int w, int h, int isLumaFlag,
                            int qp, int initId, unsigned char* out) {
  return residual_code_impl(coeffs, w, h, isLumaFlag, qp, initId, 0, out, 1);
}

int oracle_residual_code_dq(const int* coeffs, int w, int h, int isLumaFlag,
                            int qp, int initId, int depQuant,
                            unsigned char* out) {
  return residual_code_impl(coeffs, w, h, isLumaFlag, qp, initId, depQuant,
                            out);
}

int oracle_parse_sps(const unsigned char* rbsp, int n, int* out_fields) {
  static bool romInit2 = false;
  if (!romInit2) { initROM(); romInit2 = true; }
  try {
    InputBitstream bs;
    bs.getFifo().assign(rbsp, rbsp + n);
    HLSyntaxReader reader;
    reader.setBitstream(&bs);
    SPS sps;
    ParameterSetManager psm;
    reader.parseSPS(&sps);
    out_fields[0] = sps.getMaxPicWidthInLumaSamples();
    out_fields[1] = sps.getMaxPicHeightInLumaSamples();
    out_fields[2] = sps.getBitDepth(CHANNEL_TYPE_LUMA);
    out_fields[3] = sps.getCTUSize();
    out_fields[4] = (int)sps.getMinQTSize(I_SLICE);
    out_fields[5] = sps.getMaxMTTHierarchyDepthI();
    out_fields[6] = sps.getUseDualITree() ? 1 : 0;
    out_fields[7] = sps.getSAOEnabledFlag() ? 1 : 0;
    out_fields[8] = sps.getALFEnabledFlag() ? 1 : 0;
    out_fields[9] = sps.getUseLFNST() ? 1 : 0;
    out_fields[10] = sps.getDepQuantEnabledFlag() ? 1 : 0;
    out_fields[11] = sps.getLog2MaxTbSize();
    return 0;
  } catch (...) {
    return -1;
  }
}

int oracle_parse_pps(const unsigned char* rbsp, int n, int* out_fields) {
  try {
    InputBitstream bs;
    bs.getFifo().assign(rbsp, rbsp + n);
    HLSyntaxReader reader;
    reader.setBitstream(&bs);
    PPS pps;
    reader.parsePPS(&pps);
    out_fields[0] = pps.getPicWidthInLumaSamples();
    out_fields[1] = pps.getPicHeightInLumaSamples();
    out_fields[2] = pps.getPicInitQPMinus26() + 26;
    out_fields[3] = pps.getPPSDeblockingFilterDisabledFlag() ? 1 : 0;
    out_fields[4] = pps.getUseDQP() ? 1 : 0;
    out_fields[5] = pps.getNoPicPartitionFlag() ? 1 : 0;
    return 0;
  } catch (...) {
    return -1;
  }
}

// Dump all context-set (name, offset, size) triples as a text blob.
int oracle_ctxset_dump(char* out, int cap) {
  std::ostringstream ss;
#define DUMP1(NAME) ss << #NAME << " " << ContextSetCfg::NAME.Offset << " " \
                       << ContextSetCfg::NAME.Size << "\n"
#define DUMPA(NAME, N) for (int i = 0; i < N; i++) \
    ss << #NAME << i << " " << ContextSetCfg::NAME[i].Offset << " " \
       << ContextSetCfg::NAME[i].Size << "\n"
  DUMP1(SplitFlag); DUMP1(SplitQtFlag); DUMP1(SplitHvFlag); DUMP1(Split12Flag);
  DUMP1(ModeConsFlag); DUMP1(SkipFlag); DUMP1(MergeFlag); DUMP1(MergeIdx);
  DUMP1(PredMode); DUMP1(MultiRefLineIdx); DUMP1(IntraLumaMpmFlag);
  DUMP1(IntraLumaPlanarFlag); DUMP1(CclmModeFlag); DUMP1(CclmModeIdx);
  DUMP1(IntraChromaPredMode); DUMP1(MipFlag); DUMP1(DeltaQP);
  DUMP1(BDPCMMode); DUMP1(QtRootCbf); DUMP1(ACTFlag);
  DUMPA(QtCbf, 3); DUMPA(SigCoeffGroup, 2); DUMPA(LastX, 2); DUMPA(LastY, 2);
  DUMPA(SigFlag, 6); DUMPA(ParFlag, 2); DUMPA(GtxFlag, 4);
  DUMP1(TsSigCoeffGroup); DUMP1(TsSigFlag); DUMP1(TsParFlag); DUMP1(TsGtxFlag);
  DUMP1(TsLrg1Flag); DUMP1(TsResidualSign);
  DUMP1(SaoMergeFlag); DUMP1(SaoTypeIdx);
  DUMP1(TransformSkipFlag); DUMP1(MTSIdx); DUMP1(LFNSTIdx); DUMP1(PLTFlag);
  DUMP1(ChromaQpAdjFlag); DUMP1(ChromaQpAdjIdc);
  DUMP1(ctbAlfFlag); DUMP1(ctbAlfAlternative); DUMP1(AlfUseTemporalFilt);
  DUMP1(CcAlfFilterControlFlag); DUMP1(IBCFlag); DUMP1(ISPMode);
  DUMP1(JointCbCrFlag);
#undef DUMP1
#undef DUMPA
  std::string s = ss.str();
  int n = (int)std::min<size_t>(s.size(), cap - 1);
  memcpy(out, s.data(), n);
  out[n] = 0;
  return n;
}

// Dump standard-initialized context states (p1 sums) and rates.
int oracle_ctx_count() { return (int)ContextSetCfg::NumberOfContexts; }
void oracle_ctx_init_dump(int qp, int initId, unsigned short* states,
                          unsigned char* rates) {
  Ctx ctx(static_cast<const BinProbModel_Std*>(nullptr));  // BPM_Std store
  ctx.init(qp, initId);
  CtxStore<BinProbModel_Std>& st = ctx.m_CtxStore_Std;
  for (unsigned i = 0; i < ContextSetCfg::NumberOfContexts; i++) {
    states[i] = st[i].getState();
    rates[i] = st[i].m_rate;
  }
}
}

