// Shim for the missing hpptools submodule header `logsumset.hpp`
// (/root/reference/.gitmodules:4-6).  Reconstructed from call sites:
// `logsum::logsumset< F > s(false); s.clear(); s.add(x); s.val();`
// — a streaming log-sum-exp accumulator (Forward_Backward.hpp:54,77-84,
// State_Transitions.hpp:87-102, Parameter_Trainer.hpp:441-443).
//
// This reconstruction computes the mathematically exact
// log(sum_i exp(x_i)) with max-shift + log1p stabilization; when the
// constructor flag requests set-buffered mode, values accumulate
// smallest-first for reproducible stable summation.  Golden tests compare
// posteriors with tolerance, so any faithful LSE is adequate; Viterbi
// (base-string equality, the strict test) never calls this class.
#ifndef __LOGSUMSET_SHIM_HPP
#define __LOGSUMSET_SHIM_HPP

#include <cmath>
#include <limits>
#include <set>

namespace logsum
{

template < typename Float_Type >
class logsumset
{
public:
    explicit logsumset(bool use_set)
        : _use_set(use_set),
          _val(-std::numeric_limits< Float_Type >::infinity()) {}

    void clear()
    {
        _buf.clear();
        _val = -std::numeric_limits< Float_Type >::infinity();
    }

    void add(Float_Type v)
    {
        if (_use_set)
        {
            _buf.insert(v);
        }
        else
        {
            _val = lse(_val, v);
        }
    }

    Float_Type val()
    {
        if (_use_set and not _buf.empty())
        {
            for (const auto& x : _buf)
            {
                _val = lse(_val, x);
            }
            _buf.clear();
        }
        return _val;
    }

private:
    static Float_Type lse(Float_Type a, Float_Type b)
    {
        if (a == -std::numeric_limits< Float_Type >::infinity()) return b;
        if (b == -std::numeric_limits< Float_Type >::infinity()) return a;
        Float_Type hi = a > b ? a : b;
        Float_Type lo = a > b ? b : a;
        return hi + std::log1p(std::exp(lo - hi));
    }

    bool _use_set;
    Float_Type _val;
    std::multiset< Float_Type > _buf;
}; // class logsumset

} // namespace logsum

#endif
