// Shim for the missing hpptools submodule header `alg.hpp`
// (/root/reference/.gitmodules:4-6).  Reconstructed from call sites:
// `alg::mean_stdv_of< F >(range, projection)` -> (mean, stdv)
// (Pore_Model.hpp:310, Fast5_Summary.hpp:225, nanocall.cpp:633);
// the stdv is the population-style sqrt(E[x^2] - E[x]^2) of the
// projected values.  Other alg helpers (min_of/max_of/os_join) are only
// used by nanocall.cpp, which the golden harness does not build.
#ifndef __ALG_SHIM_HPP
#define __ALG_SHIM_HPP

#include <cmath>
#include <utility>

namespace alg
{

template < typename Float_Type, typename Range, typename Proj >
std::pair< Float_Type, Float_Type > mean_stdv_of(const Range& r, Proj&& proj)
{
    Float_Type s = 0;
    Float_Type s2 = 0;
    unsigned long n = 0;
    for (const auto& e : r)
    {
        Float_Type v = proj(e);
        s += v;
        s2 += v * v;
        ++n;
    }
    if (n == 0)
    {
        return std::make_pair(Float_Type(0), Float_Type(0));
    }
    Float_Type mean = s / n;
    Float_Type var = s2 / n - mean * mean;
    return std::make_pair(mean, var > 0 ? std::sqrt(var) : Float_Type(0));
}

} // namespace alg

#endif
