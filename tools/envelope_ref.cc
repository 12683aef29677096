// Differential-fuzz oracle for the envelope kernel (SURVEY.md §1.4).
//
// Reproduces Watch::filterLogLine (/root/reference/src/Watch.cc:377-426)
// against the reference's own vendored nlohmann json
// (/root/reference/include/json.hpp, v3.10.5) — the EXACT serializer the
// C++ engine ships — with the wall-clock timestamp injected (the reference
// calls get_timestamp(), src/Common.cc:253-270; the Spark kernel derives
// the same "%lld.%.9ld" string from warc_ts, so both sides receive it as
// input here).
//
// Protocol: one ASCII-JSON test case per stdin line
//   {"ts": "...", "host": "...", "source": "...", "prd": "...",
//    "log_type": "...", "line": "..."}
// → one envelope per stdout line (envelopes never contain raw newlines:
// the input is a single LINE and both serializers escape \n).
//
// Build: g++ -std=c++11 -O1 -I /root/reference/include tools/envelope_ref.cc
// (tests/test_envelope_differential.py compiles it on demand and skips
// when the compiler or the reference header is absent).

#include <iostream>
#include <string>
#include <cstring>
#include <cstdint>

#include "json.hpp"
#include "Url.h"   // homer::Url — the reference's broker-URL parser
                   // (compile with /root/reference/src/Url.cc, -std=c++17)

using json = nlohmann::json;
using std::string;

static string filter_log_line(const string& unfiltered_log_line,
                              const string& ts, const string& hostname,
                              const string& watched_filepath,
                              const string& product_code,
                              const string& log_type) {
    string filtered_log_line = unfiltered_log_line;
    if (filtered_log_line.size() == 0) {
        return filtered_log_line;
    }

    json log_entry = json::object();
    log_entry["@timestamp"] = ts;
    if (hostname.size()) log_entry["host"] = hostname;
    if (watched_filepath.size()) log_entry["source"] = watched_filepath;
    if (product_code.size()) log_entry["prd"] = product_code;
    if (log_type.size()) log_entry["log_type"] = log_type;

    if (filtered_log_line[0] != '{' && filtered_log_line[0] != '[') {
        log_entry["log"] = filtered_log_line;
    } else {
        try {
            json payload = json::parse(filtered_log_line);
            log_entry["log_obj"] = payload;
        } catch (std::exception&) {
            log_entry["log"] = filtered_log_line;
        }
    }

    return log_entry.dump();
}

// Reproduces escape_to_json_string (/root/reference/src/Common.cc:227-250)
// — the Observer dialect's 7-case escaper (no \u control escapes; other
// control bytes pass through raw).
static string escape_to_json_string(const string& unescaped_string) {
    string escaped_string;
    for (string::size_type x = 0; x < unescaped_string.size(); ++x) {
        char current_character = unescaped_string[x];
        switch (current_character) {
            case 92: escaped_string += "\\\\"; break;
            case 8:  escaped_string += "\\b"; break;
            case 12: escaped_string += "\\f"; break;
            case 10: escaped_string += "\\n"; break;
            case 13: escaped_string += "\\r"; break;
            case 9:  escaped_string += "\\t"; break;
            case 34: escaped_string += "\\\""; break;
            default: escaped_string += current_character;
        }
    }
    return escaped_string;
}

// Reproduces Observer::addLogEntry (/root/reference/src/Observer.cc:128-149)
// with the timestamp injected: unquoted generated_at literal, `{`-only
// JSON detection WITHOUT validation (raw embedding).
static string observer_entry(const string& log_line, const string& ts) {
    if (log_line.size() == 0) return "";
    string json_meta = "{\"generated_at\":" + ts;
    if (log_line[0] != '{') {
        return json_meta + ",\"log\":\"" + escape_to_json_string(log_line)
               + "\"}";
    }
    return json_meta + ",\"log\":" + log_line + "}";
}

int main(int argc, char** argv) {
    std::ios::sync_with_stdio(false);
    string tc_line;
    if (argc > 1 && string(argv[1]) == "--observer") {
        // Observer-dialect fuzz mode: {"ts": "...", "log": "..."} per line
        while (std::getline(std::cin, tc_line)) {
            if (tc_line.empty()) continue;
            json tc = json::parse(tc_line);
            std::cout << observer_entry(tc["log"].get<string>(),
                                        tc["ts"].get<string>())
                      << "\n";
        }
        return 0;
    }
    if (argc > 1 && string(argv[1]) == "--url") {
        // broker-URL fuzz mode: {"url": "..."} per line → the reference
        // parser's fields (homer::Url, /root/reference/src/Url.cc:192-359;
        // getPort resolves the scheme-default table at :52-74, which the
        // engine's wire.connection_templates must reproduce)
        while (std::getline(std::cin, tc_line)) {
            if (tc_line.empty()) continue;
            json tc = json::parse(tc_line);
            json out = json::object();
            try {
                homer6::Url u(tc["url"].get<string>());
                out["scheme"] = u.getScheme();
                out["username"] = u.getUsername();
                out["password"] = u.getPassword();
                out["host"] = u.getHost();
                out["port"] = static_cast<int>(u.getPort());
                out["path"] = u.getPath();
                out["query"] = u.getQuery();
                out["fragment"] = u.getFragment();
            } catch (std::exception& e) {
                out["error"] = true;
            }
            std::cout << out.dump() << "\n";
        }
        return 0;
    }
    if (argc > 1 && string(argv[1]) == "--ts") {
        // timestamp-format fuzz mode: "<sec> <nsec>" per line → the
        // reference's "%lld.%.9ld" rendering (get_timestamp,
        // /root/reference/src/Common.cc:253-270)
        long long sec;
        long nsec;
        while (std::cin >> sec >> nsec) {
            char buffer[50];
            snprintf(buffer, 50, "%lld.%.9ld", sec, nsec);
            std::cout << buffer << "\n";
        }
        return 0;
    }
    if (argc > 1 && string(argv[1]) == "--dtoa") {
        // float-serialization fuzz mode: one hex-encoded IEEE-754 bit
        // pattern per line → nlohmann's rendering of that double
        while (std::getline(std::cin, tc_line)) {
            if (tc_line.empty()) continue;
            std::uint64_t bits = std::stoull(tc_line, nullptr, 16);
            double d;
            std::memcpy(&d, &bits, sizeof d);
            std::cout << json(d).dump() << "\n";
        }
        return 0;
    }
    while (std::getline(std::cin, tc_line)) {
        if (tc_line.empty()) continue;
        json tc = json::parse(tc_line);
        std::cout << filter_log_line(
                         tc["line"].get<string>(), tc["ts"].get<string>(),
                         tc["host"].get<string>(),
                         tc["source"].get<string>(),
                         tc["prd"].get<string>(),
                         tc["log_type"].get<string>())
                  << "\n";
    }
    return 0;
}
