// Native BN254 G1 multi-scalar multiplication (Pippenger).
//
// The host-side native performance layer (reference: joltworks' arkworks MSM,
// msm/mod.rs): 4x64-bit Montgomery arithmetic over Fq with __uint128_t
// products, Jacobian point ops, dtype-aware Pippenger windows.
// Exposed through a plain C ABI consumed via ctypes (no Python.h).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmsm.so msm.cpp

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <algorithm>

#include "mont4.h"

typedef unsigned __int128 u128;
typedef uint64_t u64;

struct Fp { u64 v[4]; };

// BN254 base field modulus q and Montgomery constants (R = 2^256)
static const Fp Q_MOD = {{0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                          0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const u64 Q_INV = 0x87d20782e4866389ULL;  // -q^{-1} mod 2^64
static const Fp R1 = {{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                       0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}};
static const Fp R2 = {{0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                       0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL}};

static inline bool ge(const Fp&a, const Fp&b){
  for(int i=3;i>=0;i--){ if(a.v[i]!=b.v[i]) return a.v[i]>b.v[i]; }
  return true;
}
static inline void sub_nored(Fp&r, const Fp&a, const Fp&b){
  u128 borrow=0;
  for(int i=0;i<4;i++){
    u128 d=(u128)a.v[i]-b.v[i]-borrow;
    r.v[i]=(u64)d; borrow=(d>>64)&1;
  }
}
static inline void add_mod(Fp&r, const Fp&a, const Fp&b){
  u128 carry=0;
  for(int i=0;i<4;i++){
    u128 s=(u128)a.v[i]+b.v[i]+carry;
    r.v[i]=(u64)s; carry=s>>64;
  }
  if(carry||ge(r,Q_MOD)) sub_nored(r,r,Q_MOD);
}
static inline void sub_mod(Fp&r, const Fp&a, const Fp&b){
  u128 borrow=0; Fp t;
  for(int i=0;i<4;i++){
    u128 d=(u128)a.v[i]-b.v[i]-borrow;
    t.v[i]=(u64)d; borrow=(d>>64)&1;
  }
  if(borrow){ u128 c=0;
    for(int i=0;i<4;i++){ u128 s=(u128)t.v[i]+Q_MOD.v[i]+c; t.v[i]=(u64)s; c=s>>64; }
  }
  r=t;
}
#ifdef MONT4_ADX
static const u64 FQ_QC[5] = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                             0xb85045b68181585dULL, 0x30644e72e131a029ULL,
                             0x87d20782e4866389ULL};
static inline void mont_mul(Fp&r, const Fp&a, const Fp&b){
  mont4_mul_adx(r.v, a.v, b.v, FQ_QC);
}
#else
static inline void mont_mul(Fp&r, const Fp&a, const Fp&b){
  u64 t[6]={0,0,0,0,0,0};
  for(int i=0;i<4;i++){
    u128 c=0;
    for(int j=0;j<4;j++){
      u128 s=(u128)a.v[i]*b.v[j]+t[j]+c;
      t[j]=(u64)s; c=s>>64;
    }
    u128 s=(u128)t[4]+c; t[4]=(u64)s; t[5]=(u64)(s>>64);
    u64 m=t[0]*Q_INV;
    c=((u128)m*Q_MOD.v[0]+t[0])>>64;
    for(int j=1;j<4;j++){
      u128 s2=(u128)m*Q_MOD.v[j]+t[j]+c;
      t[j-1]=(u64)s2; c=s2>>64;
    }
    s=(u128)t[4]+c; t[3]=(u64)s; t[4]=t[5]+(u64)(s>>64); t[5]=0;
  }
  Fp out={{t[0],t[1],t[2],t[3]}};
  if(t[4]||ge(out,Q_MOD)) sub_nored(out,out,Q_MOD);
  r=out;
}
#endif  // MONT4_ADX
static inline void mont_sqr(Fp&r, const Fp&a){ mont_mul(r,a,a); }
static inline bool is_zero(const Fp&a){ return !(a.v[0]|a.v[1]|a.v[2]|a.v[3]); }
static inline bool eq_fp(const Fp&a, const Fp&b){
  return a.v[0]==b.v[0]&&a.v[1]==b.v[1]&&a.v[2]==b.v[2]&&a.v[3]==b.v[3];
}

struct Pt { Fp X,Y,Z; };  // Jacobian; Z=0 => infinity

static inline void pt_set_inf(Pt&p){ memset(&p,0,sizeof(Pt)); }
static inline bool pt_is_inf(const Pt&p){ return is_zero(p.Z); }

static void pt_double(Pt&r, const Pt&p){
  if(pt_is_inf(p)){ r=p; return; }
  Fp A,B,C,D,E,F,t;
  mont_sqr(A,p.X);
  mont_sqr(B,p.Y);
  mont_sqr(C,B);
  add_mod(t,p.X,B); mont_sqr(t,t); sub_mod(t,t,A); sub_mod(t,t,C);
  add_mod(D,t,t);
  add_mod(E,A,A); add_mod(E,E,A);
  mont_sqr(F,E);
  Fp X3,Y3,Z3;
  sub_mod(X3,F,D); sub_mod(X3,X3,D);
  Fp C8; add_mod(C8,C,C); add_mod(C8,C8,C8); add_mod(C8,C8,C8);
  sub_mod(t,D,X3); mont_mul(Y3,E,t); sub_mod(Y3,Y3,C8);
  mont_mul(Z3,p.Y,p.Z); add_mod(Z3,Z3,Z3);
  r.X=X3; r.Y=Y3; r.Z=Z3;
}

static void pt_add(Pt&r, const Pt&p, const Pt&q){
  if(pt_is_inf(p)){ r=q; return; }
  if(pt_is_inf(q)){ r=p; return; }
  Fp Z1Z1,Z2Z2,U1,U2,S1,S2,H,Rr,t;
  mont_sqr(Z1Z1,p.Z);
  mont_sqr(Z2Z2,q.Z);
  mont_mul(U1,p.X,Z2Z2);
  mont_mul(U2,q.X,Z1Z1);
  mont_mul(S1,p.Y,q.Z); mont_mul(S1,S1,Z2Z2);
  mont_mul(S2,q.Y,p.Z); mont_mul(S2,S2,Z1Z1);
  sub_mod(H,U2,U1);
  sub_mod(Rr,S2,S1);
  if(is_zero(H)){
    if(is_zero(Rr)){ pt_double(r,p); return; }
    pt_set_inf(r); return;
  }
  add_mod(Rr,Rr,Rr);
  Fp I,J,V,HH;
  add_mod(HH,H,H); mont_sqr(I,HH);
  mont_mul(J,H,I);
  mont_mul(V,U1,I);
  Fp X3,Y3,Z3;
  mont_sqr(X3,Rr); sub_mod(X3,X3,J);
  add_mod(t,V,V); sub_mod(X3,X3,t);
  sub_mod(t,V,X3); mont_mul(Y3,Rr,t);
  Fp S1J; mont_mul(S1J,S1,J); add_mod(S1J,S1J,S1J);
  sub_mod(Y3,Y3,S1J);
  add_mod(Z3,p.Z,q.Z); mont_sqr(Z3,Z3);
  sub_mod(Z3,Z3,Z1Z1); sub_mod(Z3,Z3,Z2Z2);
  mont_mul(Z3,Z3,H);
  r.X=X3; r.Y=Y3; r.Z=Z3;
}

// mixed add: q affine (Z==R1 implied)
static void pt_add_affine(Pt&r, const Pt&p, const Fp&qx, const Fp&qy){
  if(pt_is_inf(p)){ r.X=qx; r.Y=qy; r.Z=R1; return; }
  Fp Z1Z1,U2,S2,H,Rr,t;
  mont_sqr(Z1Z1,p.Z);
  mont_mul(U2,qx,Z1Z1);
  mont_mul(S2,qy,p.Z); mont_mul(S2,S2,Z1Z1);
  sub_mod(H,U2,p.X);
  sub_mod(Rr,S2,p.Y);
  if(is_zero(H)){
    if(is_zero(Rr)){ pt_double(r,p); return; }
    pt_set_inf(r); return;
  }
  Fp HH,I,J,V;
  mont_sqr(HH,H);
  add_mod(I,HH,HH); add_mod(I,I,I);
  mont_mul(J,H,I);
  mont_mul(V,p.X,I);
  add_mod(Rr,Rr,Rr);
  Fp X3,Y3,Z3;
  mont_sqr(X3,Rr); sub_mod(X3,X3,J);
  add_mod(t,V,V); sub_mod(X3,X3,t);
  sub_mod(t,V,X3); mont_mul(Y3,Rr,t);
  Fp YJ; mont_mul(YJ,p.Y,J); add_mod(YJ,YJ,YJ);
  sub_mod(Y3,Y3,YJ);
  add_mod(Z3,p.Z,H); mont_sqr(Z3,Z3);
  sub_mod(Z3,Z3,Z1Z1); sub_mod(Z3,Z3,HH);
  r.X=X3; r.Y=Y3; r.Z=Z3;
}

// modular inverse via Fermat (q-2 exponent), for final affine conversion
static void mont_pow(Fp&r, const Fp&a, const Fp&e){
  Fp result=R1, base=a;
  for(int limb=0; limb<4; limb++){
    u64 bits=e.v[limb];
    for(int i=0;i<64;i++){
      if(bits&1) mont_mul(result,result,base);
      mont_sqr(base,base);
      bits>>=1;
    }
  }
  r=result;
}

extern "C" {

// points: n * 64 bytes (x,y 32B LE canonical each) -> Montgomery-encoded
// 64B/point buffer reusable across many msm_g1_pre calls (infinity stays
// all-zero: mont(0) = 0).
void msm_prep_points(const uint8_t* points, int64_t n, uint8_t* out) {
  #pragma omp parallel for schedule(static)
  for(int64_t i=0;i<n;i++){
    Fp x,y,mx,my;
    memcpy(x.v, points+i*64, 32);
    memcpy(y.v, points+i*64+32, 32);
    mont_mul(mx, x, R2);
    mont_mul(my, y, R2);
    memcpy(out+i*64, mx.v, 32);
    memcpy(out+i*64+32, my.v, 32);
  }
}

// prep: n * 64 bytes from msm_prep_points (Montgomery form).
// scalars: n * 32 bytes LE; out: 64 bytes affine (canonical) + 1 inf flag
void msm_g1_pre(const uint8_t* prep, const uint8_t* scalars, int64_t n,
                int c, uint8_t* out, uint8_t* out_inf) {
  // points stay in the interleaved prep layout [x0,y0,x1,y1,...]: the add
  // loop gathers points in near-random order, and one 64B struct is one
  // cache line instead of two (measured ~80 ns/add of pure miss latency)
  const Fp* P = (const Fp*)prep;
  #define PXI(i) P[2*(i)]
  #define PYI(i) P[2*(i)+1]
  std::vector<uint8_t> PINF(n);
  for(int64_t i=0;i<n;i++)
    PINF[i] = is_zero(PXI(i))&&is_zero(PYI(i));
  int maxbits=0;
  for(int64_t i=0;i<n;i++){
    const uint8_t* s=scalars+i*32;
    for(int b=255;b>=0;b--){
      if(s[b/8]&(1u<<(b%8))){ if(b+1>maxbits) maxbits=b+1; break; }
    }
  }
  if(maxbits==0){ memset(out,0,64); *out_inf=1; return; }
  if(c<=0){
    // Pippenger window: minimize windows*(n + 2*2^c) given actual bit-width
    double best=1e30;
    for(int cc=4;cc<=16;cc++){
      double cost=(double)((maxbits+cc-1)/cc)*((double)n+2.0*(1<<cc));
      if(cost<best){ best=cost; c=cc; }
    }
    // The batch-affine epoch scheme rescans its pending list once per
    // collision layer, so cost grows ~quadratically in bucket occupancy
    // (measured: 2^18 points at c=13 -> 95k pts/s vs c=16 -> 489k).
    // Keep expected occupancy n/2^c <= 8.
    while(c<16 && (n>>c)>8) c++;
  }
  int windows=(maxbits+c-1)/c;
  int nbuckets=(1<<c)-1;
  Fp QM2=Q_MOD;
  { u128 borrow=0; u64 two=2;
    for(int i=0;i<4;i++){
      u128 d=(u128)QM2.v[i]-(i==0?two:0)-borrow;
      QM2.v[i]=(u64)d; borrow=(d>>64)&1;
    } }

  std::vector<Pt> window_sums(windows);
  // Batch-affine bucket accumulation (the arkworks/gnark technique):
  // buckets stay affine; additions run in collision-free batches sharing ONE
  // modular inversion via Montgomery's trick — an affine add is ~6 muls vs
  // ~16 for a Jacobian mixed add.
  #pragma omp parallel for schedule(dynamic)
  for(int w=0;w<windows;w++){
    std::vector<Fp> bx(nbuckets), by(nbuckets);
    std::vector<uint8_t> bfull(nbuckets, 0);
    std::vector<uint32_t> used(nbuckets, 0);
    std::vector<int64_t> pend, nextp;
    pend.reserve(n);
    int bitpos=w*c;
    // word-based digit extraction (the per-bit loop cost ~0.2 s/MSM at 2^17)
    {
      int limb=bitpos>>6, off=bitpos&63;
      uint64_t mask=(c==64)?~0ull:((1ull<<c)-1);
      for(int64_t i=0;i<n;i++){
        if(PINF[i]) continue;
        uint64_t lo, hi=0;
        memcpy(&lo, scalars+i*32+limb*8, 8);
        uint64_t v=lo>>off;
        if(off && limb+1<4){
          memcpy(&hi, scalars+i*32+(limb+1)*8, 8);
          v|=hi<<(64-off);
        }
        uint32_t digit=(uint32_t)(v&mask);
        if(digit) pend.push_back(((int64_t)digit<<40)|i);
      }
    }
    std::vector<int32_t> batch_b; std::vector<int64_t> batch_i;
    std::vector<uint8_t> batch_dbl;
    std::vector<Fp> dens, prefix;
    uint32_t epoch=1;
    while(!pend.empty()){
      nextp.clear(); batch_b.clear(); batch_i.clear(); batch_dbl.clear();
      dens.clear();
      const size_t PF=12;  // prefetch distance: gathers are the bottleneck
      for(size_t pi=0;pi<pend.size();pi++){
        if(pi+PF<pend.size()){
          int64_t ef=pend[pi+PF];
          __builtin_prefetch(&P[2*(ef&0xFFFFFFFFFFLL)]);
          __builtin_prefetch(&bx[(int)(ef>>40)-1]);
          __builtin_prefetch(&by[(int)(ef>>40)-1]);
        }
        int64_t e=pend[pi];
        int b=(int)(e>>40)-1;
        int64_t i=e&0xFFFFFFFFFFLL;
        if(used[b]==epoch){ nextp.push_back(e); continue; }
        used[b]=epoch;
        if(!bfull[b]){ bx[b]=PXI(i); by[b]=PYI(i); bfull[b]=1; continue; }
        if(eq_fp(bx[b],PXI(i))){
          if(eq_fp(by[b],PYI(i))){      // doubling: lambda = 3x^2 / 2y
            Fp den; add_mod(den,by[b],by[b]);
            batch_b.push_back(b); batch_i.push_back(i);
            batch_dbl.push_back(1); dens.push_back(den);
          } else {                      // P + (-P): bucket empties
            bfull[b]=0;
          }
          continue;
        }
        Fp den; sub_mod(den,PXI(i),bx[b]);  // lambda = (y2-y1)/(x2-x1)
        batch_b.push_back(b); batch_i.push_back(i);
        batch_dbl.push_back(0); dens.push_back(den);
      }
      size_t m=dens.size();
      if(m){
        // Montgomery batch inversion in L interleaved lanes (lane of k is
        // k%L): a single prefix/suffix chain is latency-bound on the
        // dependent mont_mul (~17 ns each, ~280 ns/add measured); L
        // independent chains run at multiplier throughput instead.
        const size_t L=8;
        prefix.resize(m);
        Fp lane_acc[L];
        for(size_t l=0;l<L;l++) lane_acc[l]=R1;
        for(size_t k=0;k<m;k++){
          size_t l=k%L;
          prefix[k]=lane_acc[l];            // product of lane elems before k
          mont_mul(lane_acc[l],lane_acc[l],dens[k]);
        }
        // one inversion for the grand product, then per-lane inverses via
        // prefix/suffix products over the L lane totals
        Fp lpre[L+1]; lpre[0]=R1;
        for(size_t l=0;l<L;l++) mont_mul(lpre[l+1],lpre[l],lane_acc[l]);
        Fp inv_all; mont_pow(inv_all,lpre[L],QM2);
        Fp lane_inv[L];
        for(size_t l=L;l-- > 0;){
          mont_mul(lane_inv[l],inv_all,lpre[l]);
          mont_mul(inv_all,inv_all,lane_acc[l]);
        }
        // backward: ik[k] = lane_inv * prefix[k]; chains interleave by lane
        std::vector<Fp>& ik=dens;           // reuse storage: write ik over dens
        for(size_t k=m;k-- > 0;){
          size_t l=k%L;
          Fp d=dens[k];
          mont_mul(ik[k],lane_inv[l],prefix[k]);
          mont_mul(lane_inv[l],lane_inv[l],d);
        }
        // affine adds: buckets are distinct within a batch, so iterations
        // are independent and the OoO core overlaps the short mul chains
        for(size_t k=0;k<m;k++){
          if(k+PF<m){
            __builtin_prefetch(&P[2*batch_i[k+PF]]);
            __builtin_prefetch(&bx[batch_b[k+PF]]);
            __builtin_prefetch(&by[batch_b[k+PF]]);
          }
          int b=batch_b[k]; int64_t i=batch_i[k];
          Fp lam;
          if(batch_dbl[k]){
            Fp x2; mont_sqr(x2,bx[b]);
            Fp num; add_mod(num,x2,x2); add_mod(num,num,x2);
            mont_mul(lam,num,ik[k]);
          } else {
            Fp num; sub_mod(num,PYI(i),by[b]);
            mont_mul(lam,num,ik[k]);
          }
          Fp x3; mont_sqr(x3,lam);
          sub_mod(x3,x3,bx[b]);
          sub_mod(x3,x3,PXI(i));
          Fp y3; sub_mod(y3,bx[b],x3);
          mont_mul(y3,lam,y3);
          sub_mod(y3,y3,by[b]);
          bx[b]=x3; by[b]=y3;
        }
      }
      pend.swap(nextp);
      epoch++;
    }
    if(getenv("JOLT_MSM_DEBUG")){
      fprintf(stderr, "w=%d epochs=%u\n", w, epoch);
    }
    Pt running, acc; pt_set_inf(running); pt_set_inf(acc);
    for(int b=nbuckets-1;b>=0;b--){
      if(bfull[b]) pt_add_affine(running,running,bx[b],by[b]);
      pt_add(acc,acc,running);
    }
    window_sums[w]=acc;
  }
  Pt total; pt_set_inf(total);
  for(int w=windows-1;w>=0;w--){
    if(w!=windows-1) for(int i=0;i<c;i++) pt_double(total,total);
    pt_add(total,total,window_sums[w]);
  }

  if(pt_is_inf(total)){ memset(out,0,64); *out_inf=1; return; }
  // affine: x = X/Z^2, y = Y/Z^3; then decode from Montgomery
  Fp qm2=Q_MOD; // q-2
  {
    u128 borrow=0; u64 two=2;
    for(int i=0;i<4;i++){
      u128 d=(u128)qm2.v[i]-(i==0?two:0)-borrow;
      qm2.v[i]=(u64)d; borrow=(d>>64)&1;
    }
  }
  Fp zinv; mont_pow(zinv,total.Z,qm2);
  Fp z2; mont_sqr(z2,zinv);
  Fp z3; mont_mul(z3,z2,zinv);
  Fp ax,ay;
  mont_mul(ax,total.X,z2);
  mont_mul(ay,total.Y,z3);
  // decode: multiply by 1 (mont_mul with literal one)
  Fp one={{1,0,0,0}};
  mont_mul(ax,ax,one);
  mont_mul(ay,ay,one);
  memcpy(out, ax.v, 32);
  memcpy(out+32, ay.v, 32);
  *out_inf=0;
  #undef PXI
  #undef PYI
}

// n independent scalar multiplications of ONE affine base point.
// base: 64B canonical (x,y); scalars: n*32B LE; out: n*64B canonical affine
// (all-zero = infinity). Backs SRS power generation (g * tau^i).
void g1_scalar_muls(const uint8_t* base, const uint8_t* scalars, int64_t n,
                    uint8_t* out) {
  Fp bx,by,mx,my;
  memcpy(bx.v, base, 32);
  memcpy(by.v, base+32, 32);
  mont_mul(mx, bx, R2);
  mont_mul(my, by, R2);
  Fp qm2=Q_MOD;
  { u128 borrow=0; u64 two=2;
    for(int i=0;i<4;i++){
      u128 d=(u128)qm2.v[i]-(i==0?two:0)-borrow;
      qm2.v[i]=(u64)d; borrow=(d>>64)&1;
    } }
  Fp one={{1,0,0,0}};
  // fixed-base window table: T[w][d-1] = d * 16^w * base, so each scalar
  // multiplication is just 64 table adds with no doublings.
  static const int WC=64, WD=15;
  std::vector<Pt> table((size_t)WC*WD);
  {
    Pt p0; p0.X=mx; p0.Y=my; p0.Z=R1;
    for(int w=0;w<WC;w++){
      Pt* row=&table[(size_t)w*WD];
      row[0]=p0;
      for(int d=1;d<WD;d++) pt_add(row[d],row[d-1],p0);
      if(w+1<WC){ for(int k=0;k<4;k++) pt_double(p0,p0); }
    }
  }
  #pragma omp parallel for schedule(dynamic,16)
  for(int64_t i=0;i<n;i++){
    const uint8_t* s=scalars+i*32;
    Pt acc; pt_set_inf(acc);
    for(int w=0;w<WC;w++){
      uint32_t digit=(s[w/2]>>((w&1)*4))&0xF;
      if(digit) pt_add(acc,acc,table[(size_t)w*WD+digit-1]);
    }
    if(pt_is_inf(acc)){ memset(out+i*64,0,64); continue; }
    Fp zinv; mont_pow(zinv,acc.Z,qm2);
    Fp z2; mont_sqr(z2,zinv);
    Fp z3; mont_mul(z3,z2,zinv);
    Fp ax,ay;
    mont_mul(ax,acc.X,z2);
    mont_mul(ay,acc.Y,z3);
    mont_mul(ax,ax,one);
    mont_mul(ay,ay,one);
    memcpy(out+i*64, ax.v, 32);
    memcpy(out+i*64+32, ay.v, 32);
  }
}

// Sparse one-hot MSM: commitment of a 0/1 polynomial = sum of the bases at
// the nonzero positions (witness ra one-hots: T ones out of K*T entries).
void msm_g1_pre_onehot(const uint8_t* prep, const int64_t* idx, int64_t T,
                       uint8_t* out, uint8_t* out_inf) {
  const Fp* P = (const Fp*)prep;
  Pt total; pt_set_inf(total);
  #pragma omp parallel
  {
    Pt local; pt_set_inf(local);
    #pragma omp for schedule(static) nowait
    for(int64_t j=0;j<T;j++){
      pt_add_affine(local, local, P[2*idx[j]], P[2*idx[j]+1]);
    }
    #pragma omp critical
    pt_add(total, total, local);
  }
  if(pt_is_inf(total)){ memset(out,0,64); *out_inf=1; return; }
  Fp qm2=Q_MOD;
  { u128 borrow=0; u64 two=2;
    for(int i=0;i<4;i++){
      u128 d=(u128)qm2.v[i]-(i==0?two:0)-borrow;
      qm2.v[i]=(u64)d; borrow=(d>>64)&1;
    } }
  Fp zinv; mont_pow(zinv,total.Z,qm2);
  Fp z2; mont_sqr(z2,zinv);
  Fp z3; mont_mul(z3,z2,zinv);
  Fp ax,ay,one={{1,0,0,0}};
  mont_mul(ax,total.X,z2);
  mont_mul(ay,total.Y,z3);
  mont_mul(ax,ax,one);
  mont_mul(ay,ay,one);
  memcpy(out, ax.v, 32);
  memcpy(out+32, ay.v, 32);
  *out_inf=0;
}

// Batch of one-hot MSMs (offsets into a concatenated index array).
void msm_g1_pre_onehot_batch(const uint8_t* prep, const int64_t* idx,
                             const int64_t* offsets, int64_t k,
                             uint8_t* out) {
  #pragma omp parallel for schedule(dynamic)
  for(int64_t i=0;i<k;i++){
    msm_g1_pre_onehot(prep, idx+offsets[i], offsets[i+1]-offsets[i],
                      out+i*65, out+i*65+64);
  }
}

// Batch of independent MSMs sharing one prepared base buffer (the witness
// commitment phase: one MSM per committed polynomial). OpenMP parallelizes
// across the MSMs, which beats window-level parallelism when each MSM has
// few windows (small-scalar witness data).
// scalars: concatenated 32B-LE scalars; offsets[k]..offsets[k+1] = MSM k.
// out: k * 65 bytes (64B affine + 1 inf flag each).
void msm_g1_pre_batch(const uint8_t* prep, const uint8_t* scalars,
                      const int64_t* offsets, int64_t k, uint8_t* out) {
  int64_t maxn=0;
  for(int64_t i=0;i<k;i++){
    int64_t n=offsets[i+1]-offsets[i];
    if(n>maxn) maxn=n;
  }
  if(maxn > (1<<16) || k < 4){
    // few/huge MSMs: outer parallelism would idle cores on the largest
    // MSM — run serially so each MSM's window loop uses every core
    for(int64_t i=0;i<k;i++){
      msm_g1_pre(prep, scalars+offsets[i]*32, offsets[i+1]-offsets[i], 0,
                 out+i*65, out+i*65+64);
    }
    return;
  }
  #pragma omp parallel for schedule(dynamic)
  for(int64_t i=0;i<k;i++){
    int64_t n=offsets[i+1]-offsets[i];
    // inner parallel regions auto-serialize (nested off) inside this loop
    msm_g1_pre(prep, scalars+offsets[i]*32, n, 0, out+i*65, out+i*65+64);
  }
}

// Single-shot API (canonical points in): prep internally, then run.
void msm_g1(const uint8_t* points, const uint8_t* scalars, int64_t n,
            int c, uint8_t* out, uint8_t* out_inf) {
  std::vector<uint8_t> prep((size_t)n*64);
  msm_prep_points(points, n, prep.data());
  msm_g1_pre(prep.data(), scalars, n, c, out, out_inf);
}

}  // extern "C"
