// Shim for the missing fast5 submodule header `fast5.hpp`
// (/root/reference/.gitmodules:1-3).
//
// Two consumers:
//  - the TSV-only dev tools (run-viterbi, run-fwbw,
//    compute-state-transitions) just need the types to PARSE;
//  - the FULL reference `nanocall` binary (built by tests/ref_tools.py
//    build_ref_nanocall) needs a WORKING File for the read path of
//    Fast5_Summary.hpp:138-377.
//
// Instead of reimplementing HDF5 (no dev headers in this environment), the
// shim File reads a plain-text "f5txt" bundle exported from the very same
// arrays our h5py reader returns (tests/ref_tools.py export_f5txt), so the
// reference binary and the rebuild consume IDENTICAL event data:
//
//     #nanocall-f5txt v1
//     sampling_rate <double>
//     read_id <string-or-empty>
//     n_events <N>
//     <mean> <stdv> <start> <length>      x N   (start/length raw samples)
//
// Write-back methods (--write-fast5) throw; the golden tests compare FASTA
// and stats TSV output instead.
#ifndef __FAST5_SHIM_HPP
#define __FAST5_SHIM_HPP

#include <cstdlib>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

// maximum kmer length; defined by the real fast5.hpp and asserted against
// at Viterbi.hpp:122
#ifndef MAX_K_LEN
#define MAX_K_LEN 8
#endif

namespace hdf5_tools
{
// exception type caught at Fast5_Summary.hpp:311
struct Exception : std::runtime_error
{
    explicit Exception(const std::string& s) : std::runtime_error(s) {}
};
} // namespace hdf5_tools

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

// fields used at Fast5_Summary.hpp:356-360,734-745
struct EventDetection_Event_Entry
{
    double mean;
    double stdv;
    double start;   // raw samples (divided by sampling_rate at load_events)
    double length;  // raw samples
};

// only .read_id is used (Fast5_Summary.hpp:179-183)
struct EventDetection_Event_Parameters
{
    std::string read_id;
};

class File
{
public:
    File() = default;
    explicit File(const std::string& name, bool /*rw*/ = false) { open(name); }

    static bool is_valid_file(const std::string& name)
    {
        std::ifstream ifs(name);
        std::string first;
        return ifs and std::getline(ifs, first)
            and first == "#nanocall-f5txt v1";
    }
    // HDF5 object-leak check (nanocall.cpp:904); no HDF5 here
    static int get_object_count() { return 0; }

    void open(const std::string& name)
    {
        _name = name;
        std::ifstream ifs(name);
        std::string line, key;
        if (not (ifs and std::getline(ifs, line)
                 and line == "#nanocall-f5txt v1"))
        {
            throw hdf5_tools::Exception("not an f5txt bundle: " + name);
        }
        std::getline(ifs, line);
        {
            std::istringstream iss(line);
            iss >> key >> _sampling_rate;
            if (key != "sampling_rate") throw hdf5_tools::Exception("bad header: " + name);
        }
        std::getline(ifs, line);
        {
            std::istringstream iss(line);
            iss >> key >> _read_id;  // read_id may be empty -> key only
            if (key != "read_id") throw hdf5_tools::Exception("bad header: " + name);
        }
        unsigned long n = 0;
        std::getline(ifs, line);
        {
            std::istringstream iss(line);
            iss >> key >> n;
            if (key != "n_events") throw hdf5_tools::Exception("bad header: " + name);
        }
        _events.clear();
        _events.reserve(n);
        for (unsigned long i = 0; i < n; ++i)
        {
            EventDetection_Event_Entry e;
            if (not (ifs >> e.mean >> e.stdv >> e.start >> e.length))
            {
                throw hdf5_tools::Exception("truncated events: " + name);
            }
            _events.push_back(e);
        }
        _open = true;
    }
    bool is_open() const { return _open; }
    void close() { _open = false; }

    bool have_sampling_rate() const { return _open; }
    double get_sampling_rate() const { return _sampling_rate; }

    bool have_eventdetection_events(const std::string& /*grp*/) const
    {
        return _open and not _events.empty();
    }
    EventDetection_Event_Parameters
    get_eventdetection_event_params(const std::string& /*grp*/) const
    {
        EventDetection_Event_Parameters p;
        p.read_id = _read_id;
        return p;
    }
    std::vector< EventDetection_Event_Entry >
    get_eventdetection_events(const std::string& /*grp*/) const
    {
        return _events;
    }

    std::vector< std::string > get_basecall_group_list() const { return {}; }

    // pore-model-from-fast5 loaders (Pore_Model.hpp:54-64,99-109,203-217):
    // template members, never instantiated by the golden builds
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

    // write-back (Fast5_Summary.hpp:379-437): not supported by the shim
    template < typename... Args > void add_basecall_seq(Args&&...) const { fail(); }
    template < typename... Args > void add_basecall_events(Args&&...) const { fail(); }
    template < typename... Args > void add_basecall_model(Args&&...) const { fail(); }
    template < typename... Args > void add_basecall_model_params(Args&&...) const { fail(); }

private:
    static void fail()
    {
        throw std::logic_error(
            "fast5 shim: HDF5 access is not available in the golden-test build");
    }

    std::string _name;
    std::string _read_id;
    double _sampling_rate = 0.0;
    std::vector< EventDetection_Event_Entry > _events;
    bool _open = false;
}; // class File

} // namespace fast5

#endif
