// Minimal JSON parser for tokenizer.json files (objects, arrays, strings
// with escapes incl. \uXXXX surrogate pairs, numbers, bool, null).
// Written for this project; no external dependencies.
#pragma once

#include <cerrno>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace minijson {

struct Value;
using ValuePtr = std::shared_ptr<Value>;

struct Value {
    enum class Type { Null, Bool, Number, String, Array, Object };
    Type type = Type::Null;
    bool b = false;
    double num = 0.0;
    std::string str;
    std::vector<ValuePtr> arr;
    std::map<std::string, ValuePtr> obj;

    bool is_null() const { return type == Type::Null; }
    bool as_bool(bool dflt = false) const { return type == Type::Bool ? b : dflt; }
    double as_num(double dflt = 0.0) const { return type == Type::Number ? num : dflt; }
    const std::string &as_str() const { return str; }
    const ValuePtr get(const std::string &key) const {
        auto it = obj.find(key);
        return it == obj.end() ? nullptr : it->second;
    }
};

class Parser {
  public:
    explicit Parser(const char *data, size_t len) : p_(data), end_(data + len) {}

    ValuePtr parse() {
        skip_ws();
        ValuePtr v = parse_value();
        skip_ws();
        return v;
    }

  private:
    const char *p_;
    const char *end_;

    [[noreturn]] void fail(const char *msg) {
        throw std::runtime_error(std::string("json: ") + msg);
    }
    void skip_ws() {
        while (p_ < end_ && (*p_ == ' ' || *p_ == '\t' || *p_ == '\n' || *p_ == '\r'))
            ++p_;
    }
    char peek() {
        if (p_ >= end_) fail("unexpected end");
        return *p_;
    }
    char next() {
        if (p_ >= end_) fail("unexpected end");
        return *p_++;
    }
    void expect(char c) {
        if (next() != c) fail("unexpected character");
    }

    ValuePtr parse_value() {
        switch (peek()) {
        case '{': return parse_object();
        case '[': return parse_array();
        case '"': {
            auto v = std::make_shared<Value>();
            v->type = Value::Type::String;
            v->str = parse_string();
            return v;
        }
        case 't': literal("true"); return make_bool(true);
        case 'f': literal("false"); return make_bool(false);
        case 'n': literal("null"); return std::make_shared<Value>();
        default: return parse_number();
        }
    }

    void literal(const char *lit) {
        for (const char *c = lit; *c; ++c)
            if (next() != *c) fail("bad literal");
    }
    ValuePtr make_bool(bool b) {
        auto v = std::make_shared<Value>();
        v->type = Value::Type::Bool;
        v->b = b;
        return v;
    }

    ValuePtr parse_object() {
        expect('{');
        auto v = std::make_shared<Value>();
        v->type = Value::Type::Object;
        skip_ws();
        if (peek() == '}') { next(); return v; }
        while (true) {
            skip_ws();
            std::string key = parse_string();
            skip_ws();
            expect(':');
            skip_ws();
            v->obj.emplace(std::move(key), parse_value());
            skip_ws();
            char c = next();
            if (c == '}') break;
            if (c != ',') fail("expected , or }");
        }
        return v;
    }

    ValuePtr parse_array() {
        expect('[');
        auto v = std::make_shared<Value>();
        v->type = Value::Type::Array;
        skip_ws();
        if (peek() == ']') { next(); return v; }
        while (true) {
            skip_ws();
            v->arr.push_back(parse_value());
            skip_ws();
            char c = next();
            if (c == ']') break;
            if (c != ',') fail("expected , or ]");
        }
        return v;
    }

    ValuePtr parse_number() {
        const char *start = p_;
        while (p_ < end_ &&
               (*p_ == '-' || *p_ == '+' || *p_ == '.' || *p_ == 'e' ||
                *p_ == 'E' || (*p_ >= '0' && *p_ <= '9')))
            ++p_;
        auto v = std::make_shared<Value>();
        v->type = Value::Type::Number;
        // strtod, not std::stod: hostile blobs ("-", "1e") must surface as
        // the parser's own error, not exception control flow (std::stod
        // throwing also trips ASan's __cxa_throw interceptor check under
        // LD_PRELOAD, making the sanitizer matrix unusable)
        std::string text(start, p_ - start);
        char *parse_end = nullptr;
        errno = 0;
        v->num = std::strtod(text.c_str(), &parse_end);
        if (parse_end == text.c_str() || *parse_end != '\0')
            fail("invalid number");
        // overflow (1e999 -> +/-HUGE_VAL with ERANGE) is a malformed blob,
        // not an inf-valued config; underflow-to-zero/denormal also sets
        // ERANGE and stays accepted
        if (errno == ERANGE && (v->num == HUGE_VAL || v->num == -HUGE_VAL))
            fail("number out of range");
        return v;
    }

    static void append_utf8(std::string &out, uint32_t cp) {
        if (cp < 0x80) {
            out += (char)cp;
        } else if (cp < 0x800) {
            out += (char)(0xC0 | (cp >> 6));
            out += (char)(0x80 | (cp & 0x3F));
        } else if (cp < 0x10000) {
            out += (char)(0xE0 | (cp >> 12));
            out += (char)(0x80 | ((cp >> 6) & 0x3F));
            out += (char)(0x80 | (cp & 0x3F));
        } else {
            out += (char)(0xF0 | (cp >> 18));
            out += (char)(0x80 | ((cp >> 12) & 0x3F));
            out += (char)(0x80 | ((cp >> 6) & 0x3F));
            out += (char)(0x80 | (cp & 0x3F));
        }
    }

    uint32_t parse_hex4() {
        uint32_t v = 0;
        for (int i = 0; i < 4; ++i) {
            char c = next();
            v <<= 4;
            if (c >= '0' && c <= '9') v |= c - '0';
            else if (c >= 'a' && c <= 'f') v |= c - 'a' + 10;
            else if (c >= 'A' && c <= 'F') v |= c - 'A' + 10;
            else fail("bad \\u escape");
        }
        return v;
    }

    std::string parse_string() {
        expect('"');
        std::string out;
        while (true) {
            char c = next();
            if (c == '"') break;
            if (c == '\\') {
                char e = next();
                switch (e) {
                case '"': out += '"'; break;
                case '\\': out += '\\'; break;
                case '/': out += '/'; break;
                case 'b': out += '\b'; break;
                case 'f': out += '\f'; break;
                case 'n': out += '\n'; break;
                case 'r': out += '\r'; break;
                case 't': out += '\t'; break;
                case 'u': {
                    uint32_t cp = parse_hex4();
                    if (cp >= 0xD800 && cp <= 0xDBFF && p_ + 1 < end_ &&
                        p_[0] == '\\' && p_[1] == 'u') {
                        p_ += 2;
                        uint32_t lo = parse_hex4();
                        cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
                    }
                    append_utf8(out, cp);
                    break;
                }
                default: fail("bad escape");
                }
            } else {
                out += c;
            }
        }
        return out;
    }
};

inline ValuePtr parse(const char *data, size_t len) {
    return Parser(data, len).parse();
}

}  // namespace minijson
