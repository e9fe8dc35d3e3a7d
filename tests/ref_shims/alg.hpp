// Shim for the missing hpptools submodule header `alg.hpp`
// (/root/reference/.gitmodules:4-6).  Reconstructed from call sites:
// `alg::mean_stdv_of< F >(range, projection)` -> (mean, stdv)
// (Pore_Model.hpp:310, Fast5_Summary.hpp:225, nanocall.cpp:633) with
// population-style sqrt(E[x^2] - E[x]^2); `max_of`/`min_of(range, proj)`
// -> iterator to the extremal element, FIRST extremum on ties
// (std::max_element semantics; nanocall.cpp:439,554,
// Fast5_Summary.hpp:698); `all_of(range, pred)` (nanocall.cpp:443,557);
// `os_join(range, sep, proj)` -> joined string (Fast5_Summary.hpp:678,704).
#ifndef __ALG_SHIM_HPP
#define __ALG_SHIM_HPP

#include <cmath>
#include <sstream>
#include <string>
#include <type_traits>
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

// max VALUE of a range (Parameter_Trainer.hpp:328)
template < typename Range >
auto max_value_of(const Range& r) -> typename std::decay< decltype(*r.begin()) >::type
{
    auto it = r.begin();
    auto best = *it;
    for (++it; it != r.end(); ++it)
    {
        if (*it > best) best = *it;
    }
    return best;
}

template < typename Range, typename Proj >
auto max_of(Range& r, Proj&& proj) -> decltype(r.begin())
{
    auto it_max = r.begin();
    for (auto it = r.begin(); it != r.end(); ++it)
    {
        if (proj(*it) > proj(*it_max)) it_max = it;
    }
    return it_max;
}

template < typename Range, typename Proj >
auto min_of(Range& r, Proj&& proj) -> decltype(r.begin())
{
    auto it_min = r.begin();
    for (auto it = r.begin(); it != r.end(); ++it)
    {
        if (proj(*it) < proj(*it_min)) it_min = it;
    }
    return it_min;
}

template < typename Range, typename Pred >
bool all_of(const Range& r, Pred&& pred)
{
    for (const auto& e : r)
    {
        if (not pred(e)) return false;
    }
    return true;
}

template < typename Range, typename Proj >
std::string os_join(const Range& r, const std::string& sep, Proj&& proj)
{
    std::ostringstream oss;
    bool first = true;
    for (const auto& e : r)
    {
        if (not first) oss << sep;
        oss << proj(e);
        first = false;
    }
    return oss.str();
}

} // namespace alg

#endif
