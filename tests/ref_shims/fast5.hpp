// Shim for the missing fast5 submodule header `fast5.hpp`
// (/root/reference/.gitmodules:1-3).  The golden-test dev tools
// (run-viterbi, run-fwbw, compute-state-transitions) operate purely on TSV
// files; the fast5 types referenced by Pore_Model.hpp / Event.hpp /
// Viterbi.hpp only need to PARSE (their load_from_fast5 template members
// are never instantiated).  Calling any method here aborts loudly.
#ifndef __FAST5_SHIM_HPP
#define __FAST5_SHIM_HPP

#include <cstdlib>
#include <stdexcept>
#include <string>
#include <vector>

// maximum kmer length; defined by the real fast5.hpp and asserted against
// at Viterbi.hpp:122
#ifndef MAX_K_LEN
#define MAX_K_LEN 8
#endif

namespace fast5
{

struct Model_Entry
{
    std::string kmer;
    double level_mean;
    double level_stdv;
    double sd_mean;
    double sd_stdv;
};

struct Model_Parameters
{
    double scale;
    double shift;
    double drift;
    double var;
    double scale_sd;
    double var_sd;
};

class File
{
public:
    File() = default;
    explicit File(const std::string&) { fail(); }
    bool is_open() const { fail(); return false; }
    bool have_basecall_model(bool) const { fail(); return false; }
    std::vector< Model_Entry > get_basecall_model(bool) const
    {
        fail();
        return {};
    }
    Model_Parameters get_basecall_model_params(bool) const
    {
        fail();
        return {};
    }

private:
    static void fail()
    {
        throw std::logic_error(
            "fast5 shim: HDF5 access is not available in the golden-test build");
    }
}; // class File

} // namespace fast5

#endif
