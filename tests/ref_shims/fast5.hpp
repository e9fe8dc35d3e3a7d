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
// Write-back methods (--write-fast5, Fast5_Summary.hpp:379-437) dump their
// payloads as text sidecars (`<bundle>.wb.tsv`) instead of HDF5, so the
// golden tests can compare the reference's written-back basecall groups
// (seq / events / model / model params) against our h5py write-back.
#ifndef __FAST5_SHIM_HPP
#define __FAST5_SHIM_HPP

#include <cstdlib>
#include <fstream>
#include <iomanip>
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

    // write-back (--write-fast5, called from Fast5_Summary.hpp:379-437 with
    // a freshly opened File per call): instead of HDF5, append the payload
    // to a text sidecar `<bundle>.wb.tsv` for golden comparison.  Strands
    // of one read are written sequentially by the same pfor worker, and
    // different reads live in different bundles, so appends never race.
    void add_basecall_seq(unsigned st, const std::string& grp,
                          const std::string& name, const std::string& seq,
                          int default_qual = 33) const
    {
        std::ofstream ofs = wb_stream();
        ofs << "seq\t" << st << '\t' << grp << '\t' << name << '\t'
            << default_qual << '\t' << seq << '\n';
    }
    // ev: nanocall's Event_Sequence (vector of Event<Float,K>); template so
    // the shim needs no include of the consumer's headers.  Fields dumped
    // are the ones our HDF5 writer persists (fast5_io.basecall_event_table)
    // EXCEPT p_model_state, which the reference never assigns along the
    // basecall path (Viterbi.hpp:120-150 sets only model_state/move), so
    // its value is indeterminate memory.
    template < typename Event_Sequence >
    void add_basecall_events(unsigned st, const std::string& grp,
                             const Event_Sequence& ev) const
    {
        std::ofstream ofs = wb_stream();
        ofs << "events\t" << st << '\t' << grp << '\t' << ev.size() << '\n'
            << std::setprecision(9);
        for (const auto& e : ev)
        {
            ofs << "ev\t" << e.mean << '\t' << e.stdv << '\t' << e.start
                << '\t' << e.length << '\t'
                << std::string(e.model_state.begin(), e.model_state.end())
                << '\t' << e.move << '\n';
        }
    }
    // sv: vector<Pore_Model_State<Float,K>> (Pore_Model.hpp:80-165)
    template < typename State_Vector >
    void add_basecall_model(unsigned st, const std::string& grp,
                            const State_Vector& sv) const
    {
        std::ofstream ofs = wb_stream();
        ofs << "model\t" << st << '\t' << grp << '\t' << sv.size() << '\n'
            << std::setprecision(9);
        for (const auto& s : sv)
        {
            ofs << "pm\t" << std::string(s.kmer.begin(), s.kmer.end())
                << '\t' << s.level_mean << '\t' << s.level_stdv << '\t'
                << s.sd_mean << '\t' << s.sd_stdv << '\n';
        }
    }
    // params: Pore_Model_Parameters<Float> (Pore_Model.hpp:42-77)
    template < typename Params >
    void add_basecall_model_params(unsigned st, const std::string& grp,
                                   const Params& p) const
    {
        std::ofstream ofs = wb_stream();
        ofs << std::setprecision(9) << "params\t" << st << '\t' << grp
            << '\t' << p.scale << '\t' << p.shift << '\t' << p.drift << '\t'
            << p.var << '\t' << p.scale_sd << '\t' << p.var_sd << '\n';
    }

private:
    std::ofstream wb_stream() const
    {
        std::ofstream ofs(_name + ".wb.tsv", std::ios::app);
        if (not ofs)
        {
            throw hdf5_tools::Exception("cannot open sidecar: " + _name);
        }
        return ofs;
    }
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
